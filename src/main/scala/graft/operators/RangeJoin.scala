package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Interval (range) join — points joined to the intervals containing
  * them, with NO equi-key. Catalyst can only plan the raw inequality
  * `p.ts BETWEEN i.start AND i.end` as a broadcast-nested-loop join
  * (quadratic work, broadcast-bound right side). The scalable
  * formulation MANUFACTURES an equi-key: time is chunked into
  * fixed-width buckets, each interval is exploded to the buckets it
  * overlaps, points carry their single bucket, and the join becomes a
  * plain shuffle equi-join on bucket id followed by the exact
  * containment filter. Work scales with points + interval-bucket
  * overlap (pick the bucket width ~ the typical interval length so
  * each interval lands in O(1) buckets), never points × intervals.
  *
  * The same shape handles any band predicate (|a−b| ≤ w, prefix
  * ranges, IP blocks); it is what Databricks' range-join optimization
  * and KDB's window joins do under the hood, here as a composable
  * operator.
  */
object RangeJoin {

  /** Join `points` (with a `ts` column of type long/timestamp-castable)
    * to `intervals` (with `start`/`end` columns, inclusive) on
    * containment. `bucketMs` is the chunk width. Output: every
    * (point, matching interval) pair.
    *
    * Guard rails: inverted intervals (end < start) are filtered out —
    * SQL containment can never match them, but Spark's `sequence`
    * would generate a DESCENDING bucket range for them, producing
    * pairs the exact filter then has to kill. And an interval spanning
    * more than `maxBucketsPerInterval` buckets FAILS FAST (raise_error
    * inside the bucket expression, so it cannot be pruned away):
    * per-row fan-out is this operator's one silent memory hazard — the
    * result would still be exact, but a single year-long interval at a
    * 1-minute bucket width is half a million rows from one input row,
    * and the right response is a louder bucket-width choice, not a
    * quiet 500000× blowup.
    *
    * COMPATIBILITY NOTE (round-5 behavior change): calls that used to
    * run — exact but catastrophically fanned-out — now fail at runtime
    * once any interval spans more than `maxBucketsPerInterval`
    * (default 4096) buckets. Existing callers hitting the error should
    * widen `bucketMs` (preferred — it shrinks the join's blowup) or
    * explicitly raise `maxBucketsPerInterval` to accept the fan-out.
    */
  def pointsInIntervals(points: DataFrame, tsCol: String,
                        intervals: DataFrame, startCol: String, endCol: String,
                        bucketMs: Long, maxBucketsPerInterval: Long = 4096L): DataFrame = {
    require(!points.columns.contains("__b") && !intervals.columns.contains("__b"),
      "pointsInIntervals: inputs must not carry a __b column (it is the internal bucket key)")
    require(bucketMs > 0, s"pointsInIntervals: bucketMs must be positive, got $bucketMs")
    val p = points.withColumn("__b",
      floor(col(tsCol).cast("double") * 1000 / bucketMs).cast("long"))
    val sb = floor(col(startCol).cast("double") * 1000 / bucketMs).cast("long")
    val eb = floor(col(endCol).cast("double") * 1000 / bucketMs).cast("long")
    val ebChecked = when(eb - sb >= lit(maxBucketsPerInterval),
      raise_error(concat(
        lit(s"pointsInIntervals: interval spans more than $maxBucketsPerInterval " +
          "buckets (widen bucketMs or raise maxBucketsPerInterval); span = "),
        (eb - sb + 1).cast("string"))).cast("long"))
      .otherwise(eb)
    val iv = intervals
      .filter(col(endCol) >= col(startCol)) // inverted intervals match nothing
      .withColumn("__b", explode(sequence(sb, ebChecked)))
    p.join(iv, Seq("__b")) // ONE shuffle equi-join on the bucket id
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      // an interval spanning k buckets meets an in-range point once per
      // shared bucket only if the point's single bucket matches — each
      // (point, interval) pair meets exactly once, no dedup needed
      .drop("__b")
  }

  /** Query surface: events inside GLOBAL error-incident windows (each
    * `error` event opens a ±5-minute window, any user) — per-window
    * event count and value sum. The window table is corpus-derived and
    * far past broadcast range at scale, which is exactly when the
    * bucketed plan matters. Oracle replays it as the plain inequality
    * join.
    */
  def eventsInErrorWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id", "ts", "value")
    // INTERVAL arithmetic, not a double round-trip: cast(ts→double→
    // timestamp) truncates and can land the bound 1 µs short, flipping
    // boundary events against the oracle's exact ±INTERVAL comparison
    val windows = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"),
        (col("ts") - expr("INTERVAL 300 SECONDS")).as("w_start"),
        (col("ts") + expr("INTERVAL 300 SECONDS")).as("w_end"))
    pointsInIntervals(ev, "ts", windows, "w_start", "w_end",
      bucketMs = 10 * 60 * 1000)
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .orderBy("window_id")
  }
}
