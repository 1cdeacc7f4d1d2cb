package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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

  /** E44 `events_heavy_hitters`: per-type heavy users via the
    * sketch-then-verify two-phase — Misra-Gries candidates (capacity m,
    * bounded state per group, map-side partial merges) → exact
    * re-count restricted to the candidate pairs → keep count >
    * n_type/(m+1).
    *
    * Why this is EXACT and oracle-checkable despite routing through an
    * order-sensitive sketch: Misra-Gries guarantees every item with
    * true frequency > n/(m+1) survives in the summary under ANY update
    * and merge order (Misra & Gries 1982; merge rule and the merged
    * bound from Agarwal et al. 2012, "Mergeable Summaries"). The
    * candidate set is therefore always a superset of the true heavy
    * hitters, the exact re-count is over ≤ groups×m pairs (bounded —
    * broadcastable by construction), and the final threshold filter
    * discards every false candidate. Nondeterminism in the sketch
    * content never reaches the output.
    *
    * At 100 TB: phase 1 shuffles groups×m summaries (not rows);
    * phase 2's recount aggregates only rows matching a bounded
    * candidate set. The all-pairs exact alternative shuffles every
    * (group, user) pair — the two-phase is the shape that survives a
    * high-cardinality user dimension.
    */
  def heavyHitters(spark: SparkSession, dir: String, m: Int = 128): DataFrame = {
    val ev = Tables.events(spark, dir)
    val sk = ev.groupBy("event_type")
      .agg(HeavyHitterAgg.misra_gries(col("user_id"), m).as("cand"),
        count(lit(1)).as("total"))
    val cands = sk.select(col("event_type"), col("total"),
        explode(col("cand")).as("c"))
      .select(col("event_type"), col("total"), col("c.id").as("user_id"))
    ev.join(broadcast(cands), Seq("event_type", "user_id"))
      .groupBy(col("event_type"), col("user_id"), col("total"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > col("total").cast("double") / (m + 1))
      .select("event_type", "user_id", "n")
      .orderBy(col("event_type"), col("n").desc, col("user_id"))
  }
}

/** Misra-Gries summary buffer: at most `m` (item, count) counters.
  * update = classic decrement-all-on-overflow; merge = pointwise add,
  * then subtract the (m+1)-th largest count and drop non-positives
  * (the Mergeable Summaries rule — keeps the n/(m+1) error bound).
  */
final class MgBuffer(val m: Int) {
  // value type MUST be the boxed java.lang.Long: with a scala.Long
  // value the compiler null-unboxes get() misses to 0L and a
  // null-check on it is constant-true — which silently disables the
  // capacity check (MgBufferSpec pins eviction with > m distinct items
  // so this class of bug cannot come back)
  val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()

  def add(x: Long): Unit = {
    val cur = counts.get(x)
    if (cur != null) counts.put(x, cur.longValue() + 1L)
    else if (counts.size < m) counts.put(x, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue() <= 1L) it.remove()
        else e.setValue(e.getValue.longValue() - 1L)
      }
    }
  }

  def mergeFrom(other: MgBuffer): Unit = {
    val oit = other.counts.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey,
        (if (cur == null) 0L else cur.longValue()) + e.getValue.longValue())
    }
    if (counts.size > m) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - m - 1) // (m+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.longValue() <= cut) it.remove()
        else e.setValue(e.getValue.longValue() - cut)
      }
    }
  }

  /** Re-insert a previously-extracted counter — with `MgBuffer.restore`
    * the ONE reconstruction path (aggregate deserialize + streaming
    * state restore), so a representation change can't silently diverge
    * the two.
    */
  def put(id: Long, count: Long): Unit = counts.put(id, count)

  /** Counters as (id, est) sorted (est desc, id asc) — the one
    * extraction shared by the batch aggregate's eval and the streaming
    * state fold.
    */
  def sortedEntries: Array[(Long, Long)] = {
    val entries = new Array[(Long, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey.longValue(), e.getValue.longValue()); i += 1
    }
    entries.sortBy { case (id, est) => (-est, id) }
  }
}

object MgBuffer {
  /** Rebuild a buffer from extracted (id, count) arrays — the single
    * reconstruction path shared by `MisraGriesAgg.deserialize` and the
    * streaming state restore (EventStream G16).
    */
  def restore(m: Int, ids: Array[Long], counts: Array[Long]): MgBuffer = {
    require(ids.length == counts.length, s"${ids.length} ids vs ${counts.length} counts")
    val buf = new MgBuffer(m)
    var i = 0
    while (i < ids.length) { buf.put(ids(i), counts(i)); i += 1 }
    buf
  }
}

/** `misra_gries(item, m)` — per-group Misra-Gries summary as
  * `array<struct<id bigint, est bigint>>` (est desc, id asc). The
  * SUMMARY is order-sensitive (like any MG); its guaranteed-superset
  * property is what `Sketches.heavyHitters` builds on.
  */
case class MisraGriesAgg(
    item: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(m)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (id, est) =>
      new GenericInternalRow(Array[Any](id, est))
    })

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val n = buf.counts.size
    val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ids = new Array[Long](n)
    val cnts = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = bb.getLong; cnts(i) = bb.getLong; i += 1 }
    MgBuffer.restore(m, ids, cnts)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(item = cs(0))
}

object HeavyHitterAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}

  def misra_gries(item: Column, m: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(
        ExpressionUtils.expression(item.cast("bigint")), m).toAggregateExpression())
}
