package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HalfKernels

/** B29: fp16 halfvec rung. Rows-only key — this spec is the
  * correctness gate. The encode check is against an INDEPENDENT
  * nearest-even reference (a table search over all finite half
  * values with explicit ties-to-even), evaluated at every half
  * value, every adjacent-half midpoint (the complete set of RNE
  * decision boundaries), the midpoints' float neighbours, the
  * subnormal/overflow edges, and a large seeded random sweep — an
  * RNE bug has nowhere to hide that this set doesn't visit.
  */
class HalfSpec extends AnyFunSuite {
  import SparkTest._

  // all finite half values (bits, value), sorted by value
  private lazy val finiteHalves: Array[(Short, Float)] = {
    val all = (0 until 0x10000).map(_.toShort)
      .map(b => (b, HalfKernels.halfBitsToFloat(b)))
      .filter { case (_, v) => !v.isNaN && !v.isInfinite }
    all.sortBy(_._2).toArray
  }

  /** Independent RNE: nearest finite half by value; tie → even bits;
    * past the last finite midpoint → Inf.
    */
  private def refNearestEven(f: Float): Short = {
    if (f.isNaN) return HalfKernels.floatToHalfBits(f) // NaN payload not pinned
    if (f.isInfinite) return (if (f > 0) 0x7c00 else 0xfc00).toShort
    val v = f.toDouble
    if (v >= 65520.0) return 0x7c00.toShort  // beyond the 65504|Inf midpoint (tie → Inf, even)
    if (v <= -65520.0) return 0xfc00.toShort
    // binary search the insertion point in the sorted half values
    var lo = 0; var hi = finiteHalves.length - 1
    while (hi - lo > 1) {
      val mid = (lo + hi) >>> 1
      if (finiteHalves(mid)._2 <= v) lo = mid else hi = mid
    }
    val (bl, vl) = finiteHalves(lo)
    val (bh, vh) = finiteHalves(hi)
    if (v <= vl) bl
    else if (v >= vh) bh
    else {
      val dl = v - vl; val dh = vh - v
      if (dl < dh) bl
      else if (dh < dl) bh
      else if ((bl & 1) == 0) bl else bh // tie → even mantissa bits
    }
  }

  test("float->half is round-to-nearest-even at every decision boundary") {
    // -0.0 keeps its sign
    assert(HalfKernels.floatToHalfBits(-0.0f) == 0x8000.toShort)
    assert(HalfKernels.floatToHalfBits(0.0f) == 0.toShort)
    assert(HalfKernels.floatToHalfBits(Float.PositiveInfinity) == 0x7c00.toShort)
    assert(HalfKernels.floatToHalfBits(Float.NegativeInfinity) == 0xfc00.toShort)
    assert((HalfKernels.floatToHalfBits(Float.NaN) & 0x7c00) == 0x7c00 &&
      (HalfKernels.floatToHalfBits(Float.NaN) & 0x3ff) != 0)
    // every finite half value round-trips to itself (bits exact)
    finiteHalves.foreach { case (b, v) =>
      assert(HalfKernels.floatToHalfBits(v) == b,
        f"half 0x${b & 0xffff}%04x ($v) does not round-trip")
    }
    // every adjacent-half midpoint (exact in float) and its float
    // neighbours — the complete RNE decision set
    var i = 0
    while (i < finiteHalves.length - 1) {
      val lo = finiteHalves(i)._2; val hi = finiteHalves(i + 1)._2
      val mid = ((lo.toDouble + hi.toDouble) / 2.0).toFloat // exact: ≤12 sig bits
      Seq(mid, Math.nextUp(mid), Math.nextDown(mid)).foreach { f =>
        assert(HalfKernels.floatToHalfBits(f) == refNearestEven(f),
          f"boundary $f%.10g between $lo and $hi: " +
            f"got 0x${HalfKernels.floatToHalfBits(f) & 0xffff}%04x " +
            f"want 0x${refNearestEven(f) & 0xffff}%04x")
      }
      i += 1
    }
    // overflow edge: just below the 65504|Inf midpoint stays finite
    assert(HalfKernels.floatToHalfBits(Math.nextDown(65520.0f)) == 0x7bff.toShort)
    assert(HalfKernels.floatToHalfBits(65520.0f) == 0x7c00.toShort)
    // seeded random sweep across magnitudes (incl. float subnormals)
    val rnd = new scala.util.Random(42)
    (0 until 200000).foreach { _ =>
      val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
      if (!f.isNaN) {
        assert(HalfKernels.floatToHalfBits(f) == refNearestEven(f),
          s"random $f (bits ${java.lang.Float.floatToRawIntBits(f)})")
      }
    }
  }

  test("decode matches the IEEE 754 binary16 value definition exactly") {
    (0 until 0x10000).map(_.toShort).foreach { b =>
      val u = b & 0xffff
      val exp = (u >>> 10) & 0x1f; val mant = u & 0x3ff
      val sign = if ((u & 0x8000) != 0) -1 else 1
      val got = HalfKernels.halfBitsToFloat(b)
      if (exp == 0x1f) {
        if (mant != 0) assert(got.isNaN) else assert(got == sign * Float.PositiveInfinity)
      } else {
        // value = sign · m · 2^e with integer m — exact in BigDecimal
        val (m, e) = if (exp == 0) (mant, -24) else (0x400 | mant, exp - 25)
        val want = BigDecimal(sign * m) * BigDecimal(2).pow(e + 30) / BigDecimal(2).pow(30)
        // BigDecimal.exact: the default Double apply routes through
        // Double.toString and drops the trailing digits this test exists
        // to compare
        assert(BigDecimal.exact(got.toDouble) == want, s"bits 0x$u%04x: $got vs $want")
      }
    }
  }

  test("half top-k serves the rounded vectors with a fused scan kernel") {
    import graft.functions.half._
    // round-trip bound: relative error ≤ 2^-11 on normal-range values
    val errs = Tables.embeddings(spark, sf)
      .select(explode(col("embedding")).as("v"))
      .filter(abs(col("v")) > 6.2e-5f)
      .select((abs(ExpressionUtils_halfRound(col("v")) - col("v")) / abs(col("v"))).as("rel"))
      .agg(max("rel")).head().getDouble(0)
    assert(errs <= 1.0 / 2048 + 1e-12, s"fp16 relative error $errs")
    // idempotence: rounding is a projection
    val notFixed = Tables.embeddings(spark, sf)
      .select(half_round(col("embedding")).as("h"))
      .filter(half_round(col("h")) =!= col("h")).count()
    assert(notFixed == 0L, "half_round must be idempotent")
    // serving: 10 rows, high agreement with the raw exact top-k
    val got = graft.ann.Half.halfTopK(spark, sf).collect().map(_.getLong(0))
    assert(got.length == 10)
    val exact = graft.ann.Ann.bruteForceL2TopK(spark, sf, 10).collect().map(_.getLong(0))
    val recall = got.toSet.intersect(exact.toSet).size / 10.0
    assert(recall >= 0.9, s"fp16 recall $recall vs raw exact")
    // the rounding kernel stays inside whole-stage codegen
    val df = graft.ann.Half.halfTopK(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("half_round")),
      s"half_round fell out of codegen:\n$plan")
  }

  // scalar helper for the error bound (element-wise over exploded floats)
  private def ExpressionUtils_halfRound(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graft.{GraftInternal => EU}
    // wrap the scalar through the array kernel: [v] -> half_round -> [v']
    element_at(EU.column(graft.functions.HalfRound(EU.expression(array(c)))), 1)
  }
}
