package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.ngrams

/** D17: the training-data pipeline as ONE fused frame — the
  * composition every pretraining ingest actually runs, in the order
  * the stages are run in production (each stage cuts the data the
  * next stage pays for): quality gate (D2's n_words signal) →
  * mixture recipe (D12's hash filter) → exact-dedup canonical pick
  * (C1's min-id-per-md5-group) → benchmark decontamination (C7's
  * word-8-gram screen against the eval set).
  *
  * Fusion is the point: composed naively, four operators read the
  * corpus four times and shuffle it three. Fused, the per-row gates
  * (quality, mixture) ride the scan as pushed filters costing zero
  * extra passes, and only the two corpus-structural stages pay a
  * shuffle each — the md5 window for the canonical pick and the
  * shingle explode for the contamination semi-join (the eval
  * dictionary stays a broadcast, C7's shape). Two corpus shuffles
  * total, one of them over the already-gated survivor set.
  *
  * Every stage keeps its standalone operator's exact semantics — the
  * spec re-derives the survivor set by COMPOSING the four component
  * operators and asserts set equality, and the oracle replays the
  * whole chain in SQL.
  */
object Pipeline {

  def docsTrainingPipeline(spark: SparkSession, dir: String,
                           minWords: Int = 20): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // C7's eval dictionary: distinct word-8-gram hashes of src0
    val evalShingles = docs.filter(col("source") === "src0")
      .select(explode(ngrams.word_nshingle_hashes(col("text"), 8)).as("h"))
      .distinct()
    // C1's canonical pick runs over the FULL corpus (a pool doc that
    // duplicates an eval doc is still a duplicate)
    val canonical = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id")
    // per-row gates fused into the pool scan: quality + mixture
    val gated = Sampling.mixtureByHash(
      docs.filter(col("source") =!= "src0")
        .withColumn("n_words", size(split(col("text"), " ")).cast("bigint"))
        .filter(col("n_words") >= minWords),
      "doc_id", "source", Sampling.D12Recipe)
    // contamination screen over the gated survivors only (stage order
    // pays off: the shingle explode runs on the post-gate fraction)
    val contaminated = gated
      .transform(graft.Tables.spread(spark, _))
      .select(col("doc_id"),
        explode(ngrams.word_nshingle_hashes(col("text"), 8)).as("h"))
      .join(broadcast(evalShingles), Seq("h"), "left_semi")
      .select("doc_id").distinct()
    gated
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select("doc_id", "source", "n_words")
      .orderBy("doc_id")
  }
}
