package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming surface (SURVEY.md §2.G): the events table as an
  * unbounded stream. The reference has no streaming path (Postgres,
  * point queries); these are the pipeline operators a production ingest
  * of documentblocks/events would need, expressed with watermarks +
  * windows and typed stateful processing.
  *
  * Batch mirrors of both queries (Analytics.eventsWindowAgg /
  * Analytics.sessionize) are oracle-checked; the streaming versions are
  * asserted against those in ScalaTest via the memory sink.
  */
object EventStream {

  /** Parquet-file schema of events (naive micros timestamp — see
    * Tables.events).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType), // naive micros in the file
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def stageDir(dir: String): String =
    Staging.stageFile(dir, "events.parquet")

  /** Unbounded read of the events parquet as a stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    readEventsPath(spark, stageDir(dir))

  /** Same stream over an explicit directory (no staging) — lets tests
    * grow the input between runs for checkpoint-restart coverage.
    */
  def readEventsPath(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(path)
      .withColumn("ts", col("ts").cast("timestamp")) // same normalization as Tables.events

  /** G1: tumbling 1-hour windowed aggregates with a 2-hour watermark —
    * the streaming mirror of events_window_agg. State is bounded by the
    * watermark; late events beyond 2h are dropped, exactly the contract
    * a 100 TB/day ingest needs.
    */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** G13: SLIDING windowed aggregates — 2-hour windows every 30
    * minutes (each event lands in 4 overlapping windows; `window`'s
    * slide argument is what G1's tumbling form lacks). The
    * trend-smoothing surface every rate monitor uses. Same watermark
    * bound on state; the batch mirror below is the spec's oracle.
    */
  /** The ONE copy of the G13 window spec — stream and batch share it,
    * same rationale as `attributionOf`.
    */
  private def slidingAggOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  def slidingAgg(spark: SparkSession, dir: String): DataFrame =
    slidingAggOf(readEvents(spark, dir).withWatermark("ts", "2 hours"))

  /** Batch mirror of G13 (the identical shared window spec). */
  def slidingAggBatch(spark: SparkSession, dir: String): DataFrame =
    slidingAggOf(graft.Tables.events(spark, dir))

  /** G15: STREAM-STREAM interval join — click→purchase attribution
    * (each purchase matched to the same user's clicks in the
    * preceding hour). The genuinely stateful join primitive: BOTH
    * sides buffer rows in the state store, and the combination of the
    * two watermarks + the time-range predicate is what lets Spark
    * evict state (a click older than the purchase watermark minus 1 h
    * can never match again). Without the range condition the state
    * would grow unboundedly — the eviction bound is the 100 TB/day
    * design constraint, not an optimization. Inner join: matches emit
    * as they arrive, so the drained stream equals the batch mirror
    * exactly (asserted).
    */
  /** The ONE copy of the attribution contract — stream and batch both
    * call it, so the G15 stream==batch assertion can never silently
    * validate two diverged predicates (the repo's G10/Cdc.changesOf
    * pattern). `events` is either the streaming or the batch read.
    */
  private def attributionOf(events: DataFrame,
                            watermarked: Boolean): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      if (watermarked) df.withWatermark(tsCol, "2 hours") else df
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id")), "click_ts")
    val purchases = wm(events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value")), "p_ts")
    clicks.join(purchases,
      expr("""user_id = p_user AND p_ts > click_ts AND
              p_ts <= click_ts + INTERVAL 1 HOUR"""))
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("value"))
  }

  def attributionJoin(spark: SparkSession, dir: String): DataFrame =
    attributionOf(readEvents(spark, dir), watermarked = true)

  /** Batch mirror of the attribution join (same shared contract). */
  def attributionJoinBatch(spark: SparkSession, dir: String): DataFrame =
    attributionOf(graft.Tables.events(spark, dir), watermarked = false)

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double, seq: Long)
  case class SessionOut(user_id: Long, session_seq: Long, n_events: Long, sum_value: Double)

  /** G2: stateful sessionization via flatMapGroupsWithState — 30-minute
    * inactivity gap, one state object per user (bounded, O(users) state,
    * emitted and cleared as sessions close).
    */
  def sessionize(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    import spark.implicits._
    val events = readEvents(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]): Iterator[SessionOut] = {
      val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var out = List.empty[SessionOut]
      var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0, 0L))
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (st.n == 0L || t - st.lastTs > 30 * 60 * 1000L) {
          if (st.n > 0) out ::= SessionOut(userId, st.seq, st.n, st.sum)
          st = SessionState(t, t, 1L, e.value, st.seq + 1)
        } else {
          st = st.copy(lastTs = t, n = st.n + 1, sum = st.sum + e.value)
        }
      }
      state.update(st)
      out.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  case class AsofState(lastTs: Long, lastPid: Long)
  case class AsofOut(event_id: Long, prev_purchase_id: Option[Long])

  /** G7: streaming as-of enrichment — the continuous form of
    * `operators.AsofJoin.eventsAsofPurchase`: each arriving event is
    * emitted with the SAME USER's latest strictly-prior purchase. One
    * tiny state object per user (the last purchase seen), exactly the
    * "temporal join against a versioned state table" every online
    * feature pipeline runs. Within a batch, events are applied in
    * (ts, event_id) order; an equal-timestamp purchase is invisible to
    * events at that instant (strict boundary, matching the batch
    * operator), and purchase ties at one instant resolve to the
    * greatest event id (the batch tie rule). Instants are compared at
    * MICROsecond precision (the events table's own granularity —
    * `Timestamp.getTime` alone would collapse sub-millisecond
    * neighbors the batch operator distinguishes). An event arriving
    * AFTER a later purchase has already advanced the state (cross-
    * batch out-of-order arrival) is enriched conservatively with null
    * — the state holds only the latest purchase, and a strictly-prior
    * one is no longer recoverable; for in-order arrival (and any
    * single-batch replay) the result is EXACTLY the batch as-of join
    * (asserted in StreamingAsofSpec).
    */
  def asofEnrichStream(spark: SparkSession, dir: String): Dataset[AsofOut] = {
    import spark.implicits._
    val events = readEvents(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value").as[Ev]
    // full-precision instant: micros since epoch (getTime truncates to ms)
    def micros(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    def fn(userId: Long, evs: Iterator[Ev], state: GroupState[AsofState]): Iterator[AsofOut] = {
      val sorted = evs.toArray.sortBy(e => (micros(e.ts), e.event_id))
      var st = state.getOption.getOrElse(AsofState(Long.MinValue, -1L))
      val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
      var i = 0
      while (i < sorted.length) {
        val t = micros(sorted(i).ts)
        var j = i
        while (j < sorted.length && micros(sorted(j).ts) == t) j += 1
        // emit every event at instant t against the PRE-t state; the
        // strict boundary must hold ACROSS batches too: a state whose
        // purchase is at or after t never matches
        var k = i
        while (k < j) {
          out += AsofOut(sorted(k).event_id,
            if (st.lastTs < t && st.lastTs != Long.MinValue) Some(st.lastPid)
            else None)
          k += 1
        }
        // ...then fold t's purchases into the state (greatest id wins;
        // Long.MinValue sentinel always loses to a real instant)
        k = i
        while (k < j) {
          val e = sorted(k)
          if (e.event_type == "purchase" &&
              (st.lastTs == Long.MinValue || t > st.lastTs ||
                (t == st.lastTs && e.event_id > st.lastPid)))
            st = AsofState(t, e.event_id)
          k += 1
        }
        i = j
      }
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  case class ReachState(sketch: Array[Byte], n: Long)
  case class ReachOut(event_type: String, est_users: Long, n_events: Long)

  /** G8: streaming reach sketch — the continuous form of E27: one
    * MERGEABLE HLL sketch per event type held as typed group state,
    * updated per micro-batch, the running estimate emitted each batch
    * (OutputMode.Update). The state object is the serialized sketch
    * (≤ ~2 KB at lgK=12) — bounded regardless of stream volume, which
    * is the whole point of sketch-valued state: an exact distinct
    * would hold every user id ever seen. Same lgK and register width
    * (HLL_8) as Spark's hll_sketch_agg, and HLL registers are
    * order-independent maxima, so after draining the stream the
    * estimate is IDENTICAL to the batch sketch of the same rows
    * (asserted in StreamingSketchSpec).
    */
  def reachSketchStream(spark: SparkSession, dir: String,
                        lgK: Int = 12,
                        srcPath: Option[String] = None): Dataset[ReachOut] = {
    import spark.implicits._
    import org.apache.datasketches.hll.{HllSketch, TgtHllType}
    val events = srcPath.map(readEventsPath(spark, _)).getOrElse(readEvents(spark, dir))
      .select(col("event_type"), col("user_id")).as[(String, Long)]

    def fn(et: String, rows: Iterator[(String, Long)],
           state: GroupState[ReachState]): Iterator[ReachOut] = {
      val prev = state.getOption
      val sk = prev.map(s => HllSketch.heapify(s.sketch))
        .getOrElse(new HllSketch(lgK, TgtHllType.HLL_8))
      var n = prev.map(_.n).getOrElse(0L)
      rows.foreach { case (_, uid) => sk.update(uid); n += 1 }
      state.update(ReachState(sk.toUpdatableByteArray, n))
      Iterator(ReachOut(et, Math.round(sk.getEstimate), n))
    }

    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  case class HhState(ids: Array[Long], counts: Array[Long], n: Long)
  case class HhOut(event_type: String, candidates: Array[Long], n_events: Long)

  /** G16: streaming heavy-hitter candidates — E44's Misra-Gries phase
    * as per-type flatMapGroupsWithState state. The state is the m
    * (item, count) counters themselves (≤ m rows per event type —
    * bounded like G8's HLL, never per-user), folded with the same
    * `MgBuffer` object the batch aggregate uses, so the stream carries
    * E44's exact guarantee: after any prefix, every user above
    * n_seen/(m+1) is in the candidate set. The exact-verify half stays
    * a batch job over the emitted candidates (E44 phase 2) — the
    * standard lambda split for frequency monitoring.
    */
  def heavyHitterStream(spark: SparkSession, dir: String, m: Int = 128,
                        srcPath: Option[String] = None): Dataset[HhOut] = {
    import spark.implicits._
    val events = srcPath.map(readEventsPath(spark, _)).getOrElse(readEvents(spark, dir))
      .select(col("event_type"), col("user_id")).as[(String, Long)]

    def fn(et: String, rows: Iterator[(String, Long)],
           state: GroupState[HhState]): Iterator[HhOut] = {
      val prev = state.getOption
      val buf = prev.map(s => graft.operators.MgBuffer.restore(m, s.ids, s.counts))
        .getOrElse(new graft.operators.MgBuffer(m))
      var n = prev.map(_.n).getOrElse(0L)
      rows.foreach { case (_, uid) => buf.add(uid); n += 1 }
      val sorted = buf.sortedEntries
      state.update(HhState(sorted.map(_._1), sorted.map(_._2), n))
      Iterator(HhOut(et, sorted.map(_._1), n))
    }

    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fn)
  }

  /** G11: streaming outlier gate — E41's Tukey fences applied
    * IN-STREAM as a stream-static join: the fence frame is a
    * |event_type|-row STATIC dimension (computed from the reference
    * window by E41's exact-quantile machinery — in production a
    * materialized metadata table refreshed on its own cadence), so
    * the screen is stateless, append-mode, and per-row — the shape
    * that keeps an anomaly monitor alive at 100 TB/day. The spec
    * asserts the streamed screen flags EXACTLY the batch E41 rows.
    */
  def outlierStream(spark: SparkSession, dir: String): DataFrame = {
    val fences = graft.operators.Analytics.outlierFences(spark, dir)
    readEvents(spark, dir)
      .filter(col("value").isNotNull)
      .join(fences, col("event_type") === col("__et"))
      .filter(col("value") < col("lo") || col("value") > col("hi"))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("value") < col("lo"), "low").otherwise("high").as("side"))
  }

  /** G4: streaming exact dedup — `dropDuplicates` on event_id with a
    * watermark bounding the dedup state (the streaming mirror of C1;
    * state is evicted once the watermark passes, which is what makes
    * exact dedup feasible on an unbounded 100 TB/day stream).
    */
  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, dir)
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .select("event_id", "user_id", "event_type", "value")

  /** Run a streaming DF to a memory sink until input is drained;
    * returns the sink table name.
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
