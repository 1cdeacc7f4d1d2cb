package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ann.IvfIndex
import graft.functions.vector._

/** Streaming vector ingest: arriving embeddings are routed to their IVF
  * list (nearest centroid against the broadcast centroid table) as they
  * land — the streaming half of index maintenance. The reference builds
  * indexes offline and re-searches; a 100 TB/day pipeline assigns
  * vectors at ingest so the partitioned layout stays current.
  */
object VectorStream {

  val rawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def stageDir(dir: String): String =
    Staging.stageFile(dir, "embeddings.parquet")

  /** Streaming nearest-centroid assignment: the `nearest_centroid`
    * expression (centroid matrix baked in at plan time, from the batch-
    * built index) runs inside the streaming scan — stateless, so it
    * composes freely with downstream streaming aggregation.
    */
  def assignStream(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val idx = IvfIndex.getOrBuild(spark, dir, k)
    spark.readStream.schema(rawSchema).parquet(stageDir(dir))
      .select(col("vec_id"),
        nearest_centroid(col("embedding"), idx.centroids).as("list_id"))
  }

  /** Running list-occupancy counts (Update mode) — the live view of
    * buildReport.
    */
  def listCounts(spark: SparkSession, dir: String, k: Int = 16): DataFrame =
    assignStream(spark, dir, k)
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_vectors"))

  /** G5: continuous permission-aware top-k — the ONLINE half of the
    * reference's insert-then-search loop (hnsw/insertion.py inserts,
    * then the same top-k query must reflect the new blocks). A standing
    * (user, query-vector) subscription is maintained as typed group
    * state: arriving blocks are permission-filtered by a stream-static
    * join, scored inside the streaming scan, and folded into a bounded
    * top-k state; each micro-batch emits the current ids. State is k
    * entries — constant, no watermark needed. At scale this shape runs
    * one state entry per standing subscription, keyed by query id.
    */
  def topkStream(spark: SparkSession, dir: String, userId: Long = 1,
                 k: Int = 10): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val acc = graft.rbac.Rbac.accessibleDocs(spark, dir, userId)
    val qvec = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    spark.readStream.schema(rawSchema).parquet(stageDir(dir))
      .join(acc, col("vec_id") === col("document_id")) // stream-static filter
      .select(col("vec_id"),
        l2_dist(col("embedding"), typedLit(qvec)).as("dist"))
      .as[(Long, Double)]
      .groupByKey(_ => 0) // one standing subscription
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Long, Double)], state: org.apache.spark.sql.streaming.GroupState[Seq[(Double, Long)]]) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
            rows.map { case (id, d) => (d, id) })
            .sorted.take(k) // (dist, id) ordering = ORDER BY dist, id
          state.update(merged)
          merged.map(_._2)
      }
      .toDF("topk_ids")
  }

  /** G17: micro-batch GRAPH serving — arriving QUERY vectors are
    * answered by the session-cached graph index (B31's symmetrized kNN
    * graph + medoid seeds) and the answers append to `outDir` as
    * (query_id, block_id, rank) parquet. The walk is an ITERATIVE beam
    * (rounds of frontier joins) — not expressible as one incremental
    * streaming plan, and it doesn't need to be: each micro-batch is a
    * bounded query set, exactly the batch walk's input, so foreachBatch
    * runs `GraphSearch.graphTopKFor` per trigger (the standard
    * batch-inside-stream serving shape; per-batch walk state released
    * after the sink write). Results are asserted EQUAL to the batch
    * walk in GraphSearchSpec.
    */
  def graphServeStream(spark: SparkSession, dir: String, queryDir: String,
                       outDir: String, checkpoint: String, k: Int = 10)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    spark.readStream.schema(rawSchema).parquet(queryDir)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val out = graft.ann.GraphSearch.graphTopKFor(spark, dir, batch, k)
          out.write.mode("append").parquet(outDir)
          out.unpersist(blocking = true)
        }
        () // foreachBatch wants Unit
      }
      .start()
  }
}
