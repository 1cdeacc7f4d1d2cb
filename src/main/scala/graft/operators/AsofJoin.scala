package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** As-of join — the temporal-enrichment operator Spark's join surface
  * lacks (reference analogue: the stream tables a serving system keeps
  * per entity; the same operator every feature/training pipeline runs
  * to attach "state as of event time").
  *
  * Scalable formulation: UNION the two sides with a side tag, ONE
  * shuffle on the key, one spillable window sort by (time, side), and a
  * running `last(payload, ignoreNulls)` — O(1) incremental frame per
  * row. Never an inequality range join (which Catalyst can only plan as
  * a broadcast nested loop over candidate ranges) and never a per-row
  * probe: at 100 TB both sides stream through a single sort-merge pass
  * per key partition.
  */
object AsofJoin {

  /** For each left row, attach the payload of the right row with the
    * greatest `rightTime` before `leftTime` (strictly before when
    * `strict`, at-or-before otherwise) within the same `key`. Left rows
    * with no prior right row keep null payloads.
    *
    * Both inputs must carry `key`; payload column names must not
    * collide with left's columns. Among right rows tied on (key, time)
    * the greatest payload (per column, in `payload` order) wins —
    * deterministic, and a tie is impossible when (key, rightTime) is
    * unique. Null payload VALUES are treated as missing for that
    * column (each payload column is filled independently). Right rows
    * with a NULL key or NULL time are dropped before the union — SQL
    * `rt < t` / `k = k` semantics never match them (without the
    * filter they'd sort FIRST in the window and latch onto every left
    * row of their key).
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: Seq[String],
           strict: Boolean = true): DataFrame = {
    val leftCols = left.columns
    // the documented contract, ENFORCED (cf. RangeJoin/Salted, which
    // require() their reserved columns): a payload name colliding with
    // a left column would silently resolve ambiguously and enrich with
    // the wrong side's values rather than erroring
    val collisions = payload.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"asof: payload column(s) ${collisions.mkString(", ")} collide with left's columns")
    val reserved = Seq("__t", "__side")
    val reservedHits =
      (leftCols ++ right.columns ++ payload).filter(reserved.contains).distinct
    require(reservedHits.isEmpty,
      s"asof: ${reservedHits.mkString(", ")} are reserved internal columns")
    // side ordering at equal time encodes the boundary semantics:
    // strict → left sorts BEFORE right (a same-instant right row is
    // invisible); at-or-before → right first (it matches).
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(if (strict) 0 else 2))
    val r = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select((col(key) +: col(rightTime).as("__t") +: payload.map(col)): _*)
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col("__t") +: col("__side") +: payload.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true) // right's left-cols = null
      .select(leftCols.map(col) ++ Seq(col("__side")) ++
        payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") =!= 1) // keep left rows, now carrying state
      .drop("__side")
  }

  /** Query surface: each event enriched with the SAME USER's most
    * recent strictly-prior purchase event — the "state as of" shape
    * (oracle: DuckDB replays it as a windowed candidate join).
    */
  def eventsAsofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("prev_purchase_id"))
    asof(ev.select("event_id", "user_id", "ts"), purchases,
      key = "user_id", leftTime = "ts", rightTime = "p_ts",
      payload = Seq("prev_purchase_id"), strict = true)
      .select("event_id", "prev_purchase_id")
      .orderBy("event_id")
  }
}
