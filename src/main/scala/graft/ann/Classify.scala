package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.vector._

/** B35-B37: the supervised evaluation surface of a vector index — the
  * `label` column that ships with the embeddings table put to its
  * standard uses (the reference evaluates its indexes with
  * ground-truth sweeps, basic_benchmark/compute_ground_truth.py; label
  * agreement is the classic complement: faiss's benchs grade IVF/graph
  * indexes by kNN-classification accuracy on labeled corpora).
  *
  * All three operators are deterministic (majority vote with
  * ties-to-smaller-label) and fully oracle-replayable.
  */
object Classify {

  /** B35 `ann_knn_classify`: exact kNN majority-vote classification for
    * the benchmark queries — one corpus scan (queries broadcast), the
    * bounded top-k heap per query, one tiny vote aggregation. The
    * canonical "use the index as a classifier" shape; also the quality
    * yardstick B37's approximate variant is compared against.
    */
  def knnClassify(spark: SparkSession, dir: String, nq: Int = 8,
                  k: Int = 10): DataFrame = {
    // the exact top-k IS ann_batch_topk's — one shared definition of
    // the batch ground-truth pipeline (broadcast queries, self
    // exclusion, bounded heap), so the tie/exclusion conventions
    // cannot drift between the oracle-checked keys
    val topk = Ann.batchTopK(spark, dir, nq, k)
      .withColumnRenamed("block_id", "vec_id")
    val labels = Tables.embeddings(spark, dir).select("vec_id", "label")
    votes(topk.join(labels, "vec_id"))
  }

  /** B37 `ann_graph_classify`: the SAME vote over the graph walk's
    * top-k (B31's cached visited state) — classification through the
    * approximate serving index instead of the exact scan; agreement
    * with B35 measures the index, not the classifier.
    */
  def graphClassify(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
    val topk = GraphSearch.topOf(GraphSearch.visited(spark, dir), k)
      .select(col("query_id"), col("cand_id").as("vec_id"))
    votes(topk.join(labels, "vec_id"))
  }

  /** Majority label per query: most votes, ties to the smaller label. */
  private def votes(neighborLabels: DataFrame): DataFrame =
    neighborLabels
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("n"))
      .groupBy("query_id")
      .agg(min_by(struct(col("label"), col("n")), struct(-col("n"), col("label"))).as("m"))
      .select(col("query_id"), col("m.label").as("pred_label"), col("m.n").as("votes"))
      .orderBy("query_id")

  /** B36 `ann_cell_label_stats`: per-IVF-cell label purity — the
    * clustering-quality report of the index build (a cell whose members
    * share a label is semantically coherent; purity in exact integer
    * ten-thousandths, the cross-engine convention). One scan (the
    * assignment runs inside it), one two-level aggregation.
    */
  def cellLabelStats(spark: SparkSession, dir: String, cells: Int = 16): DataFrame = {
    val idx = IvfIndex.getOrBuild(spark, dir, cells)
    val counts = Tables.embeddings(spark, dir)
      .select(col("label"),
        nearest_centroid(col("embedding"), idx.centroids).as("cell"))
      .groupBy("cell", "label")
      .agg(count(lit(1)).as("n"))
    counts.groupBy("cell")
      .agg(sum(col("n")).as("n_vectors"),
        min_by(struct(col("label"), col("n")), struct(-col("n"), col("label"))).as("m"))
      .select(col("cell"), col("n_vectors"),
        col("m.label").as("major_label"), col("m.n").as("major_votes"))
      // integer ten-thousandths (SQL `div`): no float division anywhere
      .withColumn("purity_x10000", expr("major_votes * 10000 div n_vectors"))
      .orderBy("cell")
  }
}
