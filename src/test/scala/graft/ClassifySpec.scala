package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Classify, GraphSearch, IvfIndex}

/** B35-B37 supervised evaluation: driver-reference majority votes,
  * purity arithmetic, and cross-key consistency.
  */
class ClassifySpec extends AnyFunSuite {
  import SparkTest._

  private def l2(a: Array[Float], b: Array[Float]): Double = refL2(a, b)

  private def majority(labels: Seq[Int]): (Int, Long) =
    labels.groupBy(identity).map { case (l, v) => (l, v.size.toLong) }
      .toSeq.minBy { case (l, n) => (-n, l) }

  test("knn classification equals a driver majority vote over exact top-10") {
    val sp = spark
    val rows = Tables.embeddings(sp, sf).select("vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val emb = rows.map(r => r._1 -> r._2).toMap
    val lab = rows.map(r => r._1 -> r._3).toMap
    val ids = emb.keys.toSeq
    val expect = (0L until 8L).map { q =>
      val top = ids.filter(_ != q).sortBy(o => (l2(emb(q), emb(o)), o)).take(10)
      val (l, n) = majority(top.map(lab))
      (q, l, n)
    }.toSeq
    val got = Classify.knnClassify(sp, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("graph classification votes over exactly the walk's top-10") {
    val sp = spark
    val lab = Tables.embeddings(sp, sf).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vis = GraphSearch.visited(sp, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = vis.groupBy(_._1).toSeq.map { case (q, rs) =>
      val top = rs.sortBy(r => (r._3, r._2)).take(10).map(_._2)
      val (l, n) = majority(top.map(lab).toSeq)
      (q, l, n)
    }.sortBy(_._1)
    val got = Classify.graphClassify(sp, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("cell label stats: driver-exact purity, full accounting") {
    val sp = spark
    val idx = IvfIndex.getOrBuild(sp, sf, 16)
    val rows = Tables.embeddings(sp, sf).select("vec_id", "embedding", "label")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def assign(v: Array[Float]): Int =
      idx.centroids.indices.minBy { c =>
        var s = 0.0; var i = 0
        val cent = idx.centroids(c); val n = math.min(v.length, cent.length)
        while (i < n) { val d = v(i).toDouble - cent(i).toDouble; s += d * d; i += 1 }
        (s, c)
      }
    val expect = rows.groupBy(r => assign(r._2)).toSeq.map { case (cell, m) =>
      val (l, n) = majority(m.map(_._3).toSeq)
      (cell, m.size.toLong, l, n, n * 10000L / m.size)
    }.sortBy(_._1)
    val got = Classify.cellLabelStats(sp, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // every vector is accounted for exactly once
    assert(got.map(_._2).sum == rows.length.toLong)
    assert(got.forall(r => r._4 <= r._2 && r._5 <= 10000L))
  }
}
