package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** H8: CDC upsert/merge — apply a versioned change batch
  * (op ∈ upsert|delete) to a base table with last-writer-wins
  * semantics: the highest-version change per key decides the row's
  * fate, lower versions and the base row are superseded, and a
  * winning delete removes the key. This is the MERGE/CDC-apply half
  * of the mutation surface (H5/H6 cover physical delete + undo; this
  * is the logical table-maintenance operator every warehouse ingest
  * runs — the reference's UPDATE/DELETE SQL surface over its
  * documentblocks tables, re-expressed as a batch merge).
  *
  * Scale shape: the 100 TB asymmetry is base ≫ changes, so the apply
  * must never shuffle or sort the base. The LWW winner is computed on
  * the CHANGES frame alone (window over the change batch); the base
  * contributes only a LEFT ANTI equi-join against the winner's key
  * set — AQE broadcasts that key set while the batch is small and
  * falls back to a shuffle join past the threshold; either way the
  * base is scanned once, never globally sorted. Applying the same
  * batch twice is a no-op on the final state (idempotent, asserted).
  */
object Cdc {

  /** Last-writer-wins winner per key: the change row with the highest
    * version. The window partitions by the CHANGE key — the change
    * batch, not the base, pays the sort.
    *
    * Tie-break contract (a batch with DUPLICATE versions for one key
    * is legal input): (version, op, payload length) descending — op
    * descending makes an upsert beat a same-version delete, and the
    * G10 streaming fold applies the IDENTICAL tuple order, so batch
    * and stream cannot disagree. Rows tied on all three (same
    * version, op, and length but different text) are equivalent under
    * every exposed output; which text survives is unspecified.
    */
  def latestChanges(changes: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col("version").desc, col("op").desc,
      coalesce(length(col("text")), lit(-1L)).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply the batch: base rows whose key carries no change survive
    * untouched (version 0); winning upserts replace/insert; winning
    * deletes drop the key. Requires `changes` = base data columns +
    * (version: bigint, op: string).
    */
  def upsertApply(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val latest = latestChanges(changes, key)
    base.join(latest.select(key), Seq(key), "left_anti")
      .withColumn("version", lit(0L))
      .unionByName(latest.filter(col("op") =!= "delete").drop("op"))
  }

  /** Deterministic derived change batch over a documents frame (shared
    * verbatim by the batch query and the G10 streaming apply, so the
    * two paths cannot desynchronize): doc_id%5 updated at v1,
    * doc_id%10 updated again at v2 (proving LWW), doc_id%7 deleted at
    * v3 (a delete beats both updates), doc_id%11 mirrored as an insert
    * under a fresh key.
    */
  def changesOf(docs: DataFrame): DataFrame = {
    val d = docs.select("doc_id", "text", "lang", "source")
    val u1 = d.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" u1")).as("text"),
        col("lang"), col("source"), lit(1L).as("version"), lit("upsert").as("op"))
    val u2 = d.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" u2")).as("text"),
        col("lang"), col("source"), lit(2L).as("version"), lit("upsert").as("op"))
    val del = d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        col("lang"), col("source"), lit(3L).as("version"), lit("delete").as("op"))
    val ins = d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(lit("ins "), col("doc_id").cast("string")).as("text"),
        col("lang"), lit("cdc").as("source"),
        lit(1L).as("version"), lit("upsert").as("op"))
    u1.unionByName(u2).unionByName(del).unionByName(ins)
  }

  /** The `docs_upsert` query: apply the derived batch to the documents
    * base and report the merged state (post-merge length + the winning
    * version; 0 = untouched base row). Oracle replays the derivation,
    * the LWW window, and the anti-join/union in SQL.
    */
  def docsUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select("doc_id", "text", "lang", "source")
    upsertApply(base, changesOf(base), "doc_id")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("bigint").as("n_chars_final"), col("version"))
      .orderBy("doc_id")
  }
}
