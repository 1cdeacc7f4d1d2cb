package graft.operators

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k smallest (score, id) pairs.
  * Max-heap ordered so the WORST kept pair is at the head and can be
  * evicted in O(log k). Ties broken by id ascending, matching
  * `ORDER BY score, id LIMIT k`.
  */
final class TopKBuffer(val k: Int) {
  // (score, id) kept as their own primitive types — an id stored
  // through a Double silently loses precision past 2⁵³
  final class Entry(val score: Double, val id: Long)

  // head = largest (score, id) among the kept k
  val heap = new PriorityQueue[Entry](math.max(k, 1),
    new Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) c else java.lang.Long.compare(b.id, a.id)
      }
    })

  def add(score: Double, id: Long): Unit = {
    if (heap.size() < k) {
      heap.offer(new Entry(score, id))
    } else {
      val worst = heap.peek()
      if (score < worst.score || (score == worst.score && id < worst.id)) {
        heap.poll()
        heap.offer(new Entry(score, id))
      }
    }
  }

  /** kth-smallest score kept so far; +∞ while the heap holds < k. */
  def kthScore: Double =
    if (heap.size() < k) Double.PositiveInfinity else heap.peek().score

  def mergeFrom(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); add(e.score, e.id) }
  }

  /** ids sorted by (score asc, id asc). */
  def sortedIds: Array[Long] = {
    val arr = heap.toArray(new Array[Entry](heap.size()))
    java.util.Arrays.sort(arr, new Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(a.id, b.id)
      }
    })
    arr.map(_.id)
  }
}

/** `topk_ids(score, id, k)` — per-group `ORDER BY score, id LIMIT k`
  * as a partial-aggregatable function returning `array<bigint>`.
  *
  * Why not `row_number() OVER (PARTITION BY g ORDER BY score)`? The
  * window form shuffles EVERY row to its group's partition and sorts
  * there — at 100 TB the shuffle is the whole job. This aggregate keeps
  * a k-element heap per group per map task, so only `groups × k` rows
  * cross the wire (reference analogue: per-partition `ORDER BY vector
  * <-> q LIMIT k` then merge, dynamic_partition/search.py:114
  * merge_results_with_filter).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_ids"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericArrayData(buf.sortedIds)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val n = buf.heap.size()
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

/** `topk_kth(score, id, k)` — the kth-smallest score per group, +∞ when
  * the group holds fewer than k rows. Same bounded-heap buffer as
  * `topk_ids`; used as the per-group pruning radius in two-phase exact
  * kNN (phase 1 establishes the bound from probed cells, phase 2 prunes
  * the remaining cells against it losslessly).
  */
case class KthSmallestScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "topk_kth"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = buf.kthScore

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val n = buf.heap.size()
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    val it = buf.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KthSmallestScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KthSmallestScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

/** Bounded top-k buffer over DISTINCT ids. Contract: the score must be
  * a deterministic function of the id within the group (the kNN bound
  * phase's dist = d(src, id)), so "duplicate id" implies "duplicate
  * (score, id) pair". A duplicate must not occupy two heap slots: the
  * kth of a multiset with dups can undercut the kth over distinct
  * candidate POINTS, and a pruning bound derived from it turns lossy.
  * Membership is an O(k) scan of the kept entries — k is a small
  * constant (≤ tens) everywhere this aggregate is used, so a side
  * hash-set would cost more than it saves.
  */
final class TopKDistinctBuffer(val k: Int) {
  val inner = new TopKBuffer(k)

  private def kept(id: Long): Boolean = {
    val it = inner.heap.iterator()
    while (it.hasNext) { if (it.next().id == id) return true }
    false
  }

  def add(score: Double, id: Long): Unit =
    if (!kept(id)) inner.add(score, id)

  def kthScore: Double = inner.kthScore

  def mergeFrom(other: TopKDistinctBuffer): Unit = {
    val it = other.inner.heap.iterator()
    while (it.hasNext) { val e = it.next(); add(e.score, e.id) }
  }
}

/** `topk_kth_distinct(score, id, k)` — kth-smallest score over DISTINCT
  * ids per group, +∞ below k distinct ids. The union-of-rings bound
  * phase of the exact kNN build aggregates BOTH ring projections' (dist,
  * dst) candidate streams in one pass; the same dst can arrive from both
  * rings, and counting it twice would make the "kth candidate" bound
  * lossy (see TopKDistinctBuffer). Scores must be deterministic per id
  * within a group.
  */
case class KthSmallestDistinctScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKDistinctBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "topk_kth_distinct"

  override def createAggregationBuffer(): TopKDistinctBuffer =
    new TopKDistinctBuffer(k)

  override def update(buf: TopKDistinctBuffer, input: InternalRow): TopKDistinctBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKDistinctBuffer, other: TopKDistinctBuffer): TopKDistinctBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKDistinctBuffer): Any = buf.kthScore

  override def serialize(buf: TopKDistinctBuffer): Array[Byte] = {
    val n = buf.inner.heap.size()
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    val it = buf.inner.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKDistinctBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKDistinctBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KthSmallestDistinctScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KthSmallestDistinctScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

object TopKAgg {
  /** Column facade: `groupBy(g).agg(topk_ids($"dist", $"block_id", 10))`. */
  def topk_ids(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(
        ExpressionUtils.expression(score.cast("double")),
        ExpressionUtils.expression(id.cast("bigint")),
        k).toAggregateExpression())

  /** kth-smallest score per group (+∞ below k rows). */
  def topk_kth(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      KthSmallestScore(
        ExpressionUtils.expression(score.cast("double")),
        ExpressionUtils.expression(id.cast("bigint")),
        k).toAggregateExpression())

  /** kth-smallest score over DISTINCT ids per group (+∞ below k distinct
    * ids); scores must be deterministic per id within the group.
    */
  def topk_kth_distinct(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      KthSmallestDistinctScore(
        ExpressionUtils.expression(score.cast("double")),
        ExpressionUtils.expression(id.cast("bigint")),
        k).toAggregateExpression())
}
