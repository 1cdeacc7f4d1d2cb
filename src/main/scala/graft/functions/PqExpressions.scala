package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (see graft.ann.PqIndex).
  *
  * Both carry their (tiny) trained tables as constructor state — the
  * same pattern as NearestCentroid: plan-time constants, row-time tight
  * loops.
  */

/** `pq_encode(array<float>) -> binary` — per-subspace argmin against
  * the codebook; one byte per subspace.
  */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "pq_encode"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nSub = codebook.length
    val subDim = codebook(0)(0).length
    val out = new Array[Byte](nSub)
    var s = 0
    while (s < nSub) {
      var best = 0; var bestD = Float.MaxValue
      var c = 0
      while (c < codebook(s).length) {
        val cent = codebook(s)(c)
        var acc = 0.0f; var i = 0
        while (i < subDim) {
          val d = v.getFloat(s * subDim + i) - cent(i); acc += d * d; i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "float[][][]")
    // all locals fresh-named: janino block-scopes for-init declarations,
    // so fixed names collide when two kernels share a projection
    val (cb, nSub, subDim, out) = (ctx.freshName("cb"), ctx.freshName("nSub"),
      ctx.freshName("subDim"), ctx.freshName("out"))
    val (s, best, bestD, cs, c, cent, acc, i, d) = (ctx.freshName("s"),
      ctx.freshName("best"), ctx.freshName("bestD"), ctx.freshName("cs"),
      ctx.freshName("c"), ctx.freshName("cent"), ctx.freshName("acc"),
      ctx.freshName("i"), ctx.freshName("d"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |float[][][] $cb = $cbRef;
         |int $nSub = $cb.length;
         |int $subDim = $cb[0][0].length;
         |byte[] $out = new byte[$nSub];
         |for (int $s = 0; $s < $nSub; $s++) {
         |  int $best = 0; float $bestD = Float.MAX_VALUE;
         |  float[][] $cs = $cb[$s];
         |  for (int $c = 0; $c < $cs.length; $c++) {
         |    float[] $cent = $cs[$c];
         |    float $acc = 0.0f;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      float $d = $v.getFloat($s * $subDim + $i) - $cent[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $c; }
         |  }
         |  $out[$s] = (byte) $best;
         |}
         |${ev.value} = $out;
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `pq_adc(binary) -> double` — asymmetric distance: sum of per-query
  * table entries indexed by the stored codes. 8 array lookups per row
  * instead of 64 multiply-adds.
  */
case class PqAdcDistance(child: Expression, table: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "pq_adc"
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val code = a.asInstanceOf[Array[Byte]]
    var acc = 0.0
    var s = 0
    while (s < code.length) { acc += table(s)(code(s) & 0xff); s += 1 }
    acc
  }
  // ADC IS the innermost loop of the PQ scan — per-row interpreted eval
  // with boxing would undercut the 32×-fewer-bytes argument entirely
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tblRef = ctx.addReferenceObj("adcTable", table, "float[][]")
    val (tbl, code, acc, s) = (ctx.freshName("tbl"), ctx.freshName("code"),
      ctx.freshName("acc"), ctx.freshName("s"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |float[][] $tbl = $tblRef;
         |byte[] $code = $v;
         |double $acc = 0.0;
         |for (int $s = 0; $s < $code.length; $s++) {
         |  $acc += (double) $tbl[$s][$code[$s] & 0xff];
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
