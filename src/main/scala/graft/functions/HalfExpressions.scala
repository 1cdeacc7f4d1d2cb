package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._

/** IEEE 754 binary16 (half-precision) kernels — the fp16 rung of the
  * quantization ladder (raw fp32 → **fp16 2×** → SQ8 4× → PQ 32× →
  * BQ 256×) and the analogue of pgvector's `halfvec` type
  * (src/halfvec.c; halfvec_l2 etc. operate on the fp16-rounded
  * values). fp16 is the no-training rung: unlike SQ8/PQ/BQ there is
  * no fitted grid or codebook — encode is a pure per-element rounding,
  * so it needs no build job and no sidecar.
  *
  * Conversion correctness: float→half uses EXACT power-of-two
  * scaling (scalb — exact on floats widened to double) to place the
  * value on the half mantissa grid, then `Math.rint` — which IS
  * round-half-to-even — picks the nearest representable. Every
  * scaling here is exact in double (a float has 24 significant bits;
  * double holds 53), so the only rounding in the pipeline is the one
  * rint performs on the grid — i.e. textbook RNE, without the
  * bit-twiddling boundary hazards. The spec checks this against an
  * independent nearest-even table search at every half value, every
  * adjacent-half midpoint (the complete set of rounding decision
  * boundaries), the midpoints' float neighbours, and the
  * subnormal/overflow edges.
  */
object HalfKernels {
  /** float → binary16 bits, round-to-nearest-even. */
  def floatToHalfBits(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    if (java.lang.Float.isNaN(f)) return (sign | 0x7e00).toShort
    val v = Math.abs(f.toDouble) // exact
    // ≥ 65520 rounds to Inf: the 65504|Inf midpoint is 65520 and the
    // tie goes to Inf (0x7c00, even) over 65504 (0x7bff, odd)
    if (v >= 65520.0) return (sign | 0x7c00).toShort
    if (v < 6.103515625e-5 /* 2^-14 */ ) {
      // subnormal half grid: n/2^24 for n in [0, 1024)
      val n = Math.rint(Math.scalb(v, 24)) // scalb exact; rint = RNE
      return (sign | n.toInt).toShort      // n == 1024 → 0x0400, the first normal — correct bits
    }
    // normal half grid at exponent he: (1024 + m)/2^10 · 2^he
    val he = Math.getExponent(v)
    val m = Math.rint(Math.scalb(v, 10 - he)).toInt // in [1024, 2048]
    // m == 2048 rolls into he+1 with mantissa 0 — the bit layout does
    // this for free: sign | ((he+15) << 10) + 2048 carries into the
    // exponent field
    (sign | (((he + 15) << 10) + (m - 1024))).toShort
  }

  /** binary16 bits → exact float. */
  def halfBitsToFloat(h: Short): Float = {
    val u = h & 0xffff
    val sign = if ((u & 0x8000) != 0) -1f else 1f
    val exp = (u >>> 10) & 0x1f
    val mant = u & 0x3ff
    if (exp == 0x1f) {
      if (mant != 0) Float.NaN else sign * Float.PositiveInfinity
    } else if (exp == 0) {
      sign * Math.scalb(mant.toFloat, -24) // subnormal: mant / 2^24, exact
    } else {
      sign * Math.scalb((0x400 | mant).toFloat, exp - 25) // (1024+m)/2^10 · 2^(exp-15)
    }
  }

  /** Fused round-trip: the value a halfvec store would serve. */
  def roundToHalf(f: Float): Float = halfBitsToFloat(floatToHalfBits(f))
}

/** `half_round(array<float>) -> array<float>` — every element rounded
  * through binary16 (RNE) and back: the values a halfvec column
  * actually holds. Fused encode∘decode — one pass, no intermediate
  * code array.
  */
case class HalfRound(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "half_round"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = HalfKernels.roundToHalf(v.getFloat(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, out, i) = (ctx.freshName("n"), ctx.freshName("out"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |int $n = $v.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.HalfKernels.roundToHalf($v.getFloat($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `half_bits(array<float>) -> array<smallint>` — the stored fp16
  * codes themselves (2 bytes/dim): what a halfvec column writes.
  */
case class HalfBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "half_bits"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = HalfKernels.floatToHalfBits(v.getFloat(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, out, i) = (ctx.freshName("n"), ctx.freshName("out"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |int $n = $v.numElements();
         |short[] $out = new short[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.HalfKernels.floatToHalfBits($v.getFloat($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object half {
  def half_round(v: Column): Column =
    ExpressionUtils.column(HalfRound(ExpressionUtils.expression(v)))
  def half_bits(v: Column): Column =
    ExpressionUtils.column(HalfBits(ExpressionUtils.expression(v)))
}
