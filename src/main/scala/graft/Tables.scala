package graft

import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries read through here so column pruning / filter pushdown are
  * uniform: callers `.select` only what they need and Catalyst pushes the
  * projection into the parquet scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet stores a naive (not UTC-adjusted) timestamp, which
    * Spark infers as TIMESTAMP_NTZ; downstream operators and the DuckDB
    * oracle both speak plain session-local TIMESTAMP (sessions here pin
    * UTC), so normalize the column to TimestampType. Earlier testdata
    * generations stored TIMESTAMP(NANOS) — kept readable via the
    * nanos-as-long legacy read + micros truncation, branch chosen from
    * the file's own inferred type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already session-local timestamps
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Fan a row-level pipeline's input out to the scheduler's
    * parallelism ONLY when the scan is narrower (r16, guide §2.4): the
    * text/dedup operators opened with an unconditional
    * `repartition(defaultParallelism)` so a one-file small-SF scan
    * parallelizes its tokenize/shingle kernels — but at 100 TB the scan
    * already carries far more splits than cores and the same line is a
    * full shuffle of the corpus TEXT for nothing. Callers must be
    * partition-layout-insensitive (per-row kernels, integer-count
    * aggregations, hash-derived keys — no float summation order).
    *
    * MUST receive a SCAN-ROOTED frame (ADVICE r16): the partition-count
    * probe goes through df.rdd, which physically plans the frame on
    * every call — free for the raw table scans passed today, but a
    * frame with exchanges would re-plan per call and, under AQE, report
    * the un-finalized count.
    */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
