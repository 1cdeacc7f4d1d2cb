package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bit-vector kernels — the BINARY rung of the quantization ladder
  * (raw → SQ8 4× → PQ 32× → BQ 256×) and the hamming/jaccard distance
  * family the reference's vector engine ships natively (pgvector
  * src/bitvec.c:44 hamming_distance, :59 jaccard_distance, packed-word
  * popcounts in src/bitutils.c; binary_quantize in src/vector.c).
  *
  * A 64-dim float vector (256 bytes) packs to ONE long (8 bytes): each
  * dimension contributes the bit `v > threshold(dim)`, with per-dim
  * thresholds trained in one corpus scan (BqIndex). Distances are
  * XOR/AND/OR + popcount over the packed words — branch-free loops that
  * stay inside WholeStageCodegen, reading 1/32nd of the scan bytes.
  *
  * Thresholds are DOUBLE and the comparison promotes the float value,
  * exactly like the DuckDB oracle's `v::DOUBLE > t` replay — float
  * promotion is exact, so the bits cannot diverge between engines.
  */
case class BqEncode(child: Expression, thresholds: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bq_encode"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dims = math.min(v.numElements(), thresholds.length)
    val out = new Array[Long]((thresholds.length + 63) / 64)
    var i = 0
    while (i < dims) {
      if (v.getFloat(i).toDouble > thresholds(i)) out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val thr = ctx.addReferenceObj("thresholds", thresholds, "double[]")
    val (t, dims, out, i) = (ctx.freshName("thr"), ctx.freshName("dims"),
      ctx.freshName("out"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |double[] $t = $thr;
         |int $dims = Math.min($v.numElements(), $t.length);
         |long[] $out = new long[($t.length + 63) / 64];
         |for (int $i = 0; $i < $dims; $i++) {
         |  if ((double) $v.getFloat($i) > $t[$i]) $out[$i >> 6] |= (1L << ($i & 63));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance over packed bit codes — popcount(x XOR y) summed
  * across words (pgvector bitvec.c:44 + bitutils.c word loop).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "hamming_distance"
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var s = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Jaccard SIMILARITY over packed bit codes — popcount(x AND y) /
  * popcount(x OR y), with two all-zero codes defined as identical
  * (similarity 1.0). pgvector's jaccard_distance (bitvec.c:59) is
  * `1 - this`. Both popcounts are integers, so the division is one
  * exact IEEE op — bit-identical across engines.
  */
case class BitJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bit_jaccard"
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var inter = 0L; var union = 0L
    while (i < n) {
      inter += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      union += java.lang.Long.bitCount(x.getLong(i) | y.getLong(i))
      i += 1
    }
    if (union == 0L) 1.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
    val (inter, union) = (ctx.freshName("inter"), ctx.freshName("union"))
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $inter = 0L, $union = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $inter += java.lang.Long.bitCount($x.getLong($i) & $y.getLong($i));
         |  $union += java.lang.Long.bitCount($x.getLong($i) | $y.getLong($i));
         |}
         |${ev.value} = ($union == 0L) ? 1.0 : (double) $inter / (double) $union;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API facade. */
object bits {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def bq_encode(v: Column, thresholds: Array[Double]): Column =
    col(BqEncode(ex(v), thresholds))
  def hamming_dist(a: Column, b: Column): Column = col(HammingDistance(ex(a), ex(b)))
  def bit_jaccard(a: Column, b: Column): Column  = col(BitJaccard(ex(a), ex(b)))
}
