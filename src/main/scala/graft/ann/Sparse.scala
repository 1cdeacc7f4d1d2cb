package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.sparse._

/** Sparse-vector surface (pgvector src/sparsevec.c): vectors as
  * (indices, values) pairs, searched with the merge-scan kernels in
  * functions.SparseExpressions.
  *
  * The testdata ships dense embeddings, so the sparse frame is DERIVED
  * deterministically — keep dimensions with value > `thresh` — which
  * is both a real sparsifier (magnitude pruning, the standard
  * bag-of-features compaction) and exactly replayable in the DuckDB
  * oracle. The derivation uses only codegen'd higher-order builtins
  * (filter/transform over a sequence), no UDF.
  *
  * At 100 TB the sparse pair columns ARE the stored representation
  * (parquet encodes the two small arrays; scan bytes ∝ nnz, not dim)
  * and the top-k is the same broadcast-query + TakeOrderedAndProject
  * shape as every dense search here.
  */
object Sparse {

  val Dim = 64

  /** (vec_id, idx: array<int>, val: array<float>) — indices sorted
    * ascending by construction (filter preserves sequence order).
    */
  def sparsify(spark: SparkSession, dir: String, thresh: Double = 0.15): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr(s"filter(sequence(0, ${Dim - 1}), i -> embedding[i] > ${thresh}D)").as("sidx"),
        expr(s"transform(filter(sequence(0, ${Dim - 1}), i -> embedding[i] > ${thresh}D), i -> embedding[i])")
          .as("sval"))

  /** Exact sparse max-inner-product top-k against the sparsified query
    * (vec_id 0) — output (vec_id, dot rounded 4dp), fully
    * oracle-checked: the dot only sums dims where BOTH sides survive
    * the sparsifier, which DuckDB replays per dimension.
    */
  def sparseTopK(spark: SparkSession, dir: String, k: Int = 10,
                 qid: Long = 0, thresh: Double = 0.15): DataFrame = {
    val s = sparsify(spark, dir, thresh)
    val q = s.filter(col("vec_id") === qid)
      .select(col("sidx").as("qidx"), col("sval").as("qval"))
    s.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .withColumn("dot", round(sparse_dot(col("sidx"), col("sval"),
        col("qidx"), col("qval")), 4))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "dot")
  }

  /** The INVERTED INDEX over the sparse frame: one posting row
    * (dim, vec_id, v) per stored nonzero — the at-scale layout for
    * sparse retrieval (Lucene/SPLADE-style): materialized partitioned
    * by `dim`, a query touches only its own nonzero dims' postings.
    */
  def postings(spark: SparkSession, dir: String, thresh: Double = 0.15): DataFrame =
    sparsify(spark, dir, thresh)
      .select(col("vec_id"), explode(arrays_zip(col("sidx"), col("sval"))).as("p"))
      .select(col("vec_id"), col("p.sidx").as("dim"), col("p.sval").as("v"))

  /** Exact sparse top-k via the inverted index — the scale path
    * `sparseTopK`'s full-scan merge kernel trades against: join the
    * query's nonzero dims (≤ dim rows, bounded broadcast) against the
    * posting lists, partial-agg the per-term products per candidate.
    * Only vectors sharing ≥1 stored dim with the query are scored —
    * exactly the retrieval set an inverted index produces (a
    * zero-overlap vector has dot 0 and is never materialized); on any
    * corpus with ≥ k overlapping candidates the result row set equals
    * `sparseTopK`'s. Per-term math mirrors the merge kernel
    * (double(float)·double(float), summed in double), so the two
    * paths agree to the shared 4dp rounding. Fully oracle-checked.
    *
    * For query BATCHES at scale the same plan shuffles both sides on
    * `dim` instead of broadcasting — postings never change shape.
    */
  def invertedTopK(spark: SparkSession, dir: String, k: Int = 10,
                   qid: Long = 0, thresh: Double = 0.15): DataFrame = {
    val p = postings(spark, dir, thresh)
    val q = p.filter(col("vec_id") === qid).select(col("dim"), col("v").as("qv"))
    p.filter(col("vec_id") =!= qid)
      .join(broadcast(q), "dim")
      .groupBy("vec_id")
      .agg(round(sum(col("v").cast("double") * col("qv").cast("double")), 4).as("dot"))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)
  }
}
