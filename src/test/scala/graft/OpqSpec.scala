package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Ann, OpqIndex, Pca, PqIndex}

class OpqSpec extends AnyFunSuite {
  import SparkTest._

  test("eigenvalue-balanced allocation is a bijection with balanced subspace budgets") {
    // a decaying spectrum: the case plain coordinate grouping handles worst
    val eig = Array.tabulate(64)(i => math.pow(0.9, i) * 10.0)
    val perm = OpqIndex.allocate(eig)
    assert(perm.length == 64 && perm.toSet == (0 until 64).toSet)
    // the greedy balances per-subspace eigenvalue PRODUCTS (each
    // subquantizer's distortion budget ∝ the determinant of its
    // covariance block): its log-product spread must beat naive
    // contiguous coordinate grouping — the exact failure mode plain PQ
    // has on a decaying spectrum (subspace 0 hoards all the variance)
    val sums = perm.grouped(8).map(_.map(c => math.log(eig(c))).sum).toArray
    assert(sums.length == 8)
    val naive = (0 until 64).grouped(8).map(_.map(c => math.log(eig(c))).sum).toArray
    assert(sums.max - sums.min < naive.max - naive.min,
      s"greedy no better than contiguous grouping: ${sums.mkString(",")}")
    // deterministic
    assert(OpqIndex.allocate(eig).sameElements(perm))
  }

  test("full-rank rotation is an isometry: rotated L2 equals original L2") {
    val sparkRef = spark
    val rot = OpqIndex.rotated(sparkRef, sf).filter(col("vec_id") < 20)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    val raw = Tables.embeddings(sparkRef, sf).filter(col("vec_id") < 20)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1).toArray)
    def l2(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)).toDouble * (a(i) - b(i))).sum)
    for (i <- raw.indices; j <- (i + 1) until raw.length) {
      val dr = l2(raw(i), raw(j)); val dp = l2(rot(i), rot(j))
      assert(math.abs(dr - dp) <= 1e-3 * math.max(dr, 1.0),
        s"rotation not isometric at pair ($i,$j): raw=$dr rotated=$dp")
    }
  }

  test("codes are 8 bytes and the build report accounts for every vector") {
    val c = OpqIndex.codes(spark, sf).collect()
    assert(c.length == 500)
    assert(c.forall(_.getAs[Array[Byte]](1).length == OpqIndex.NumSub))
    val hist = OpqIndex.buildReport(spark, sf).agg(sum("n")).head().getLong(0)
    assert(hist == 500L)
  }

  test("OPQ ADC search with exact re-rank has PQ-class recall vs brute force") {
    val exact = Ann.bruteForceL2TopK(spark, sf, 10).collect().map(_.getLong(0)).toSet
    val opq = OpqIndex.search(spark, sf).collect().map(_.getLong(0)).toSet
    val recall = opq.intersect(exact).size / 10.0
    assert(recall >= 0.5, s"OPQ recall too low: $recall")
  }

  test("full-overfetch OPQ search equals brute force exactly (rotation lossless)") {
    val n = Tables.embeddings(spark, sf).count().toInt
    val exact = Ann.bruteForceL2TopK(spark, sf, 10).collect().map(_.getLong(0)).toSeq
    val full = OpqIndex.search(spark, sf, overfetch = n).collect().map(_.getLong(0)).toSeq
    assert(full == exact)
  }

  test("allocation consumes the model's sorted spectrum (descending eigenvalues)") {
    val m = Pca.model(spark, sf, OpqIndex.Dim)
    assert(m.eigenvalues.length == 64)
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // and the codebook trains on the permuted projection: 8 subspaces,
    // 16 codes each, rotated-space dimensionality
    val cb = OpqIndex.getOrBuild(spark, sf)
    assert(cb.centroids.length == PqIndex.NumSub)
    assert(cb.centroids.forall(s => s.length == PqIndex.CodesPerSub &&
      s.forall(_.length == OpqIndex.SubDim)))
  }
}
