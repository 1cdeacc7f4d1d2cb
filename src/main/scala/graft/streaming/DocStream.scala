package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.ngrams

/** G6: streaming ingest gate — the arrival half of the training-data
  * pipeline: documents landing in the corpus pass the quality +
  * decontamination gates IN-STREAM, so contaminated or junk docs never
  * reach the training set (the batch halves are D2/C7).
  *
  * Stateless design: the eval set's distinct shingle hashes are a
  * sorted array baked into the plan (like the IVF centroid matrix in
  * VectorStream), so the contamination check is one codegen'd
  * merge-scan per doc — no stream-side aggregation, no state store,
  * append mode. At 100 TB/day the eval dictionary is index metadata
  * refreshed with the benchmark set, not per-batch work.
  */
object DocStream {

  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val dictCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, (Long, Long)), Array[Long]]

  /** Distinct word-8-gram hashes of the eval set (source = 'src0'),
    * sorted — the decontamination dictionary (same kernel as C7),
    * computed once per (dir, n, source-file stamp): a regenerated
    * dataset re-derives the dictionary instead of gating against a
    * stale eval set.
    */
  def evalShingleDict(spark: SparkSession, dir: String, n: Int = 8): Array[Long] =
    dictCache.getOrElseUpdate((dir, n, Staging.sourceStamp(dir, "documents.parquet")),
      Tables.documents(spark, dir)
        .filter(col("source") === "src0")
        .select(explode(ngrams.word_nshingle_hashes(col("text"), n)).as("h"))
        .distinct().collect().map(_.getLong(0)).sorted)

  /** The gate itself — shared verbatim by the streaming path and its
    * batch mirror (the test's equivalence oracle). `keep` is the
    * decision a sink would route on.
    */
  private def gate(docs: DataFrame, evalHashes: Array[Long],
                   n: Int, minTokens: Long): DataFrame =
    docs.filter(col("source") =!= "src0")
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        (ngrams.sorted_jaccard(
          ngrams.word_nshingle_hashes(col("text"), n),
          typedLit(evalHashes)) > 0).as("contaminated"))
      .withColumn("keep", !col("contaminated") && col("n_tokens") >= minTokens)

  def ingestGateStream(spark: SparkSession, dir: String, n: Int = 8,
                       minTokens: Long = 5L): DataFrame =
    gate(spark.readStream.schema(rawSchema)
      .parquet(Staging.stageFile(dir, "documents.parquet")),
      evalShingleDict(spark, dir, n), n, minTokens)

  /** Batch mirror of the gate, for equivalence testing and backfills. */
  def ingestGateBatch(spark: SparkSession, dir: String, n: Int = 8,
                      minTokens: Long = 5L): DataFrame =
    gate(Tables.documents(spark, dir), evalShingleDict(spark, dir, n), n, minTokens)

  /** The D12 mixture recipe — the SAME object D12's sampler reads, so
    * retuning the recipe cannot desynchronize stream and batch.
    */
  private def mixtureWeights = graft.operators.Sampling.D12Recipe

  /** G9: streaming mixture gate — D12's recipe sampler applied
    * IN-STREAM: membership is a pure deterministic hash filter (zero
    * state, zero shuffle, append mode — the same stateless shape as
    * the ingest gate), so a doc's keep/drop decision is identical
    * whether it arrives in a stream, a backfill batch, or after the
    * corpus is resharded — the subset-invariance D12 asserts is
    * exactly what makes the recipe safe to apply at the ingest edge.
    */
  def mixtureGateStream(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureByHash(
      spark.readStream.schema(rawSchema)
        .parquet(Staging.stageFile(dir, "documents.parquet"))
        .select("doc_id", "source"),
      "doc_id", "source", mixtureWeights)

  /** Batch mirror of the streaming mixture gate (same recipe object —
    * the equality oracle in the spec, and D12's own sampler).
    */
  def mixtureGateBatch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureByHash(
      Tables.documents(spark, dir).select("doc_id", "source"),
      "doc_id", "source", mixtureWeights)

  /** G10: streaming CDC apply — H8's last-writer-wins merge at the
    * ingest edge: a stream of versioned changes is folded into
    * per-key current state with `flatMapGroupsWithState`, so a sink
    * always sees the highest-version row per key (or a delete
    * tombstone). State is ONE row per live key — the streaming-native
    * form of the batch window in `Cdc.latestChanges`, which the spec
    * asserts it matches exactly. The change DERIVATION is
    * `Cdc.changesOf` verbatim (a stateless column pipeline, so it
    * runs identically on a streaming frame); only the LWW fold needs
    * state.
    */
  def cdcApplyStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import spark.implicits._
    val changes = graft.operators.Cdc.changesOf(
      spark.readStream.schema(rawSchema)
        .parquet(Staging.stageFile(dir, "documents.parquet")))
      .select(col("doc_id"), col("version"), col("op"),
        coalesce(length(col("text")), lit(-1L)).cast("bigint").as("n_chars"))
      .as[(Long, Long, String, Long)]
    changes.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String, Long), (Long, Long, String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) { (key, rows, state) =>
        val prior = state.getOption
        // same total order as Cdc.latestChanges: (version, op, length)
        // descending — duplicate versions resolve identically in batch
        // and stream
        val best = (prior.iterator ++ rows).maxBy(r => (r._2, r._3, r._4))
        state.update(best)
        Iterator(best)
      }.toDF("doc_id", "version", "op", "n_chars")
  }

  /** Batch mirror of the streaming CDC fold: the LWW winner per key
    * from the SAME derived batch, shaped identically.
    */
  def cdcApplyBatch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Cdc.latestChanges(
      graft.operators.Cdc.changesOf(Tables.documents(spark, dir)), "doc_id")
      .select(col("doc_id"), col("version"), col("op"),
        coalesce(length(col("text")), lit(-1L)).cast("bigint").as("n_chars"))
}
