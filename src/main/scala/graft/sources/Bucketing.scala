package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Bucketed-table layout: the co-located-join answer for joins where
  * NEITHER side is broadcastable (fact-to-fact at 100 TB). Both tables
  * are written bucketed+sorted on the join key; the join then requires
  * no Exchange at all — each bucket pair joins locally. Locally this is
  * a saveAsTable into the (gitignored) spark-warehouse; on a cluster
  * it is the table layout itself.
  */
object Bucketing {

  val NumBuckets = 8

  /** Write lineitem + orders bucketed by the join key (idempotent;
    * clears a stale warehouse location left by a previous JVM whose
    * in-memory catalog died with it).
    */
  def materialize(spark: SparkSession, dir: String): Unit = {
    def write(table: String, df: => org.apache.spark.sql.DataFrame, key: String): Unit =
      if (!spark.catalog.tableExists(table)) {
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
        if (loc.exists()) {
          // stale location from a previous session's catalog
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(): Unit
          }
          rm(loc)
        }
        df.write.bucketBy(NumBuckets, key).sortBy(key)
          .mode("overwrite").saveAsTable(table)
      }
    write("lineitem_bkt",
      Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
      "l_orderkey")
    write("orders_bkt",
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
      "o_orderkey")
  }

  /** Revenue per priority through the bucketed join — with both sides
    * bucketed on the key, the plan contains NO shuffle for the join
    * (asserted in BucketingSpec).
    */
  def bucketedJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    materialize(spark, dir)
    val li = spark.table("lineitem_bkt")
    val ord = spark.table("orders_bkt")
    li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .orderBy("o_orderpriority")
  }
}
