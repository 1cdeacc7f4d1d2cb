package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Salted equi-join — the standard remedy for HOT KEYS in a shuffle
  * join (the other two being AQE's skew-join split, which only kicks in
  * past partition-size thresholds, and broadcasting, which needs a
  * small side). The big side gets a deterministic salt from a
  * high-cardinality column; the dimension side is replicated once per
  * salt value; the join key becomes (key, salt), spreading each hot
  * key's rows over `nSalt` reducers instead of one. Exact join
  * semantics are preserved (every big row meets its dim row exactly
  * once — the dim copy with the matching salt).
  */
object Salted {

  def saltedJoin(big: DataFrame, dim: DataFrame, key: String,
                 saltFrom: String, nSalt: Int): DataFrame = {
    require(!big.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin: inputs must not carry a __salt column")
    val b = big.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(nSalt.toLong)).cast("int"))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalt - 1))))
    b.join(d, Seq(key, "__salt")).drop("__salt")
  }

  /** Query surface: per-event deviation from its type's mean value —
    * a 5-key join (event_type) that at 100 TB funnels everything
    * through 5 reducers unsalted; here each type spreads over 8. The
    * oracle replays the plain unsalted join, which IS the semantics.
    */
  def eventsSaltedEnrich(spark: SparkSession, dir: String, nSalt: Int = 8): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_id", "event_type", "value")
    val dim = ev.groupBy("event_type").agg(avg("value").as("type_avg"))
    saltedJoin(ev, dim, "event_type", saltFrom = "event_id", nSalt = nSalt)
      .select(col("event_id"), col("event_type"),
        round(col("value") - col("type_avg"), 4).as("dev"))
      .orderBy("event_id")
  }
}
