package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Half
import graft.dedup.Dedup
import graft.functions.HalfKernels

/** Round-11 pins — the premises the new sidecar-replay oracles stand
  * on, asserted independently of DuckDB:
  *
  *  1. simhash banding is LOSSLESS at the declared radius: the 4×16
  *     banded join finds exactly the pairs the quadratic
  *     hamming≤3 filter finds (pigeonhole: ≤3 differing bits over 4
  *     disjoint 16-bit bands leave ≥1 band identical). The C3 oracle
  *     replays the QUADRATIC form from the signature sidecar, so this
  *     equality is what makes the replay check the banded engine.
  *  2. the fp16 oracle's computation — double-accumulated L2 top-k
  *     over the binary16-rounded values — reproduces `halfTopK`
  *     exactly (the sidecar persists the rounded values; the ranking
  *     must be derivable from them alone).
  *  3. C5's blocking is cells-INSENSITIVE: the exact near-dup pair set
  *     is identical at different cell counts (triangle cell-pair
  *     pruning is lossless at any cells value) — the premise behind
  *     r11 wiring the benchmark key to `semanticCells` without
  *     touching its quadratic oracle.
  */
class Round11Spec extends AnyFunSuite {
  import SparkTest._

  test("simhash banded join == quadratic hamming<=3 over the signatures (lossless banding)") {
    val sp = spark
    val sigs = graft.Tables.documents(sp, sf)
      .select(col("doc_id"),
        graft.functions.hashes.simhash64(
          Dedup.wordShingles(col("text"), 2)).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val quadratic = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 3
    } yield (d1, d2, h)).toSet
    val banded = Dedup.simhashPairs(sp, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == quadratic,
      s"banded join must equal the quadratic filter: ${banded.size} vs ${quadratic.size}")
  }

  test("halfTopK == double-accumulated L2 top-k over the rounded values (the fp16 oracle's computation)") {
    val sp = spark
    val rows = graft.Tables.embeddings(sp, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(HalfKernels.roundToHalf).toArray))
    val q = rows.find(_._1 == 0L).get._2
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      math.sqrt(s)
    }
    val expect = rows.filter(_._1 != 0L)
      .map { case (id, v) => (l2(v, q), id) }
      .sortBy(identity).take(10).map(_._2).toSeq
    val got = Half.halfTopK(sp, sf).collect().map(_.getLong(0)).toSeq
    assert(got == expect, "the ranking must be derivable from the rounded values alone")
  }

  test("embeddingPairs is cells-insensitive: exact pair set identical at 8 and 13 cells") {
    val sp = spark
    def pairs(cells: Int): Set[(Long, Long)] =
      Dedup.embeddingPairs(sp, sf, cells = cells).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p8 = pairs(8)
    val p13 = pairs(13)
    assert(p8 == p13,
      s"triangle blocking must be lossless at any cell count: ${p8.size} vs ${p13.size}")
    assert(p8.nonEmpty, "the sf0.001 corpus has known near-dup pairs")
  }
}
