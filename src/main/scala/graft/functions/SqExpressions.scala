package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar-quantization (SQ8) kernels — see graft.ann.SqIndex. Same
  * plan-time-constant / row-time-tight-loop pattern as the PQ kernels
  * (PqExpressions.scala); all codegen locals fresh-named (janino
  * block-scoping — see the note on PqEncode).
  */

/** `sq8_encode(array<float>) -> binary` — one byte per dimension:
  * round((v[i]-lo[i])/step[i]) clamped to [0,255].
  */
case class Sq8Encode(child: Expression, lo: Array[Float], step: Array[Float])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sq8_encode"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    if (v.numElements() < lo.length)
      throw new IllegalArgumentException(
        s"sq8_encode: embedding has ${v.numElements()} dims, grid has ${lo.length}")
    val out = new Array[Byte](lo.length)
    var i = 0
    while (i < lo.length) {
      // Double arithmetic to match codegen bit-for-bit (ulp-consistency
      // rule: every interpreted kernel mirrors its generated code)
      val q = Math.round((v.getFloat(i) - lo(i)).toDouble / step(i)).toInt
      out(i) = Math.max(0, Math.min(255, q)).toByte
      i += 1
    }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sqLo", lo, "float[]")
    val stepRef = ctx.addReferenceObj("sqStep", step, "float[]")
    val (los, steps, out, i, q) = (ctx.freshName("los"), ctx.freshName("steps"),
      ctx.freshName("out"), ctx.freshName("i"), ctx.freshName("q"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |float[] $los = $loRef;
         |float[] $steps = $stepRef;
         |if ($v.numElements() < $los.length) {
         |  throw new IllegalArgumentException(
         |    "sq8_encode: embedding has " + $v.numElements() +
         |    " dims, grid has " + $los.length);
         |}
         |byte[] $out = new byte[$los.length];
         |for (int $i = 0; $i < $los.length; $i++) {
         |  int $q = (int) Math.round(
         |    (double) ($v.getFloat($i) - $los[$i]) / $steps[$i]);
         |  $out[$i] = (byte) Math.max(0, Math.min(255, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sq8_adc(binary) -> double` — asymmetric L2²: per-query table
  * [dim][256] of (q[i] − dequant(c))², code-indexed lookups (the ADC
  * trick at byte granularity — the scan never reconstructs floats).
  */
case class Sq8AdcDistance(child: Expression, table: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "sq8_adc"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var i = 0
    while (i < code.length) { acc += table(i)(code(i) & 0xff); i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("sqAdcTable", table, "float[][]")
    val (tbl, code, acc, i) = (ctx.freshName("tbl"), ctx.freshName("code"),
      ctx.freshName("acc"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |float[][] $tbl = $tblRef;
         |byte[] $code = $v;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $code.length; $i++) {
         |  $acc += (double) $tbl[$i][$code[$i] & 0xff];
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
