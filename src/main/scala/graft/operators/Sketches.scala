package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Mergeable-sketch aggregates — the cube/rollup serving layer every
  * 100 TB analytics deployment keeps NEXT TO the raw data: per-slice
  * sketches are small, persistable, and union to answer any slice
  * combination without rescanning the corpus (reference analogue: the
  * benchmark's repeated per-role distinct/selectivity scans in
  * basic_benchmark/common_function.py, which re-aggregate raw rows each
  * time).
  *
  * Uses Spark's Apache DataSketches HLL bindings (hll_sketch_agg /
  * hll_union_agg / hll_sketch_estimate) — union is associative, so
  * merging per-day sketches is BIT-IDENTICAL to sketching the whole
  * corpus at equal lgK (asserted in SketchSpec, alongside a tolerance
  * check against the exact distinct count).
  */
object Sketches {

  /** Exact per-type user reach (oracle-checked companion): the query
    * the sketches approximate. count(DISTINCT) is Spark's two-phase
    * expand aggregate — fine as a batch query, unfit as a standing
    * per-slice serving structure, which is what the HLL path fixes.
    */
  def userReach(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Per-day, per-type HLL sketches — the materializable layer.
    * (day, event_type, sketch) is tiny regardless of corpus size.
    */
  def dailySketches(spark: SparkSession, dir: String, lgK: Int = 12): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"))

  /** Rows-only query surface: per-type estimated reach from the UNION
    * of daily sketches (never touching raw events again) side by side
    * with the event count.
    */
  def reachSketch(spark: SparkSession, dir: String, lgK: Int = 12): DataFrame = {
    val est = dailySketches(spark, dir, lgK)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_users"))
    Tables.events(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("n_events"))
      .join(est, Seq("event_type"))
      .select("event_type", "est_users", "n_events")
      .orderBy("event_type")
  }
}
