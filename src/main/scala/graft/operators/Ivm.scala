package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables

/** H10: incremental view maintenance — keep a materialized aggregate
  * current under a delta batch WITHOUT recomputing the base (the
  * maintenance loop behind every "materialized view refresh
  * incremental" / Flink retract-stream aggregate): sum/count states
  * merge by key, inserts carry weight +1 and retractions weight −1,
  * and a group whose count reaches zero vanishes — so the maintained
  * frame is row-identical to a from-scratch aggregate over the
  * post-delta table, which is exactly what the spec and the oracle
  * assert.
  *
  * Scale shape: the merge is a full-outer equi-join between the
  * STATE (group-cardinality, not base-cardinality) and the delta's
  * partial aggregate (delta-sized). The base table is read zero
  * times during a refresh — that is the whole point: at 100 TB the
  * base re-aggregate costs hours, the state merge costs seconds.
  * Sum/count are the self-maintainable aggregates (min/max are not —
  * a retraction can expose a new extremum only a rescan can find;
  * that asymmetry is inherent, not an implementation gap).
  */
object Ivm {

  /** Partial-aggregate a weighted delta: weight +1 = insert, −1 =
    * retract. Produces the same (key, measure sums, count) shape as
    * the state.
    */
  def deltaAgg(delta: DataFrame, key: String, measure: String): DataFrame =
    delta.groupBy(key).agg(
      sum(col(measure) * col("weight")).as("m_sum"),
      sum(col("weight")).cast("bigint").as("n"))

  /** Merge state with a delta aggregate: full-outer on the key (Spark
    * coalesces the USING key), measures add, empty groups drop.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, key: String): DataFrame =
    state.join(
      delta.withColumnRenamed("m_sum", "d_sum").withColumnRenamed("n", "d_n"),
      Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("m_sum"), lit(0.0)) + coalesce(col("d_sum"), lit(0.0))).as("m_sum"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"))
      .filter(col("n") > 0)

  /** The `q_revenue_incremental` query: per-customer order revenue
    * maintained incrementally — the base aggregate is built from 90%
    * of orders, the remaining 10% arrive as an insert delta, and the
    * output is the MERGED state. The oracle is the plain SQL
    * aggregate over ALL orders: passing it proves the incremental
    * path lands on exactly the rows a full recompute would.
    */
  def revenueIncremental(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val base = orders.filter(col("o_orderkey") % 10 =!= 0)
    val delta = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("weight", lit(1L))
    val state = base.groupBy("o_custkey").agg(
      sum(col("o_totalprice")).as("m_sum"), count(lit(1)).as("n"))
    mergeAggState(state, deltaAgg(delta, "o_custkey", "o_totalprice"), "o_custkey")
      .select(col("o_custkey"), round(col("m_sum"), 4).as("revenue"),
        col("n").as("n_orders"))
      .orderBy("o_custkey")
  }
}
