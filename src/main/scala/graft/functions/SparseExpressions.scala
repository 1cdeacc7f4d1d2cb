package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._

/** Sparse-vector kernels over the (indices, values) pair representation
  * — the reference's vector engine ships these natively (pgvector
  * src/sparsevec.c: sparsevec type + l2/inner/cosine over index-value
  * pairs); the high-dim/low-density regime (bag-of-words, hashed
  * features, SPLADE-style learned sparse embeddings) where dense
  * arrays waste 100× the scan bytes.
  *
  * Contract: `indices` is SORTED ASCENDING with no duplicates (what
  * any sparsifier emits; pgvector enforces the same on input). All
  * three kernels are one merge-scan over the two index arrays —
  * O(nnz_x + nnz_y), branch-only loops that stay inside
  * WholeStageCodegen like the dense family in VectorExpressions.
  */
abstract class SparseBinaryExpression extends QuaternaryExpression with ExpectsInputTypes {
  def xi: Expression; def xv: Expression; def yi: Expression; def yv: Expression
  override def first: Expression = xi
  override def second: Expression = xv
  override def third: Expression = yi
  override def fourth: Expression = yv
  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(FloatType),
    ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** Sparse inner product — pgvector sparsevec `<#>` is its negation. */
case class SparseDot(xi: Expression, xv: Expression, yi: Expression, yv: Expression)
    extends SparseBinaryExpression {
  override def prettyName: String = "sparse_dot"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val (ia, va) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ib, vb) = (c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
    val (nx, ny) = (ia.numElements(), ib.numElements())
    var i = 0; var j = 0; var s = 0.0
    while (i < nx && j < ny) {
      val x = ia.getInt(i); val y = ib.getInt(j)
      if (x == y) { s += va.getFloat(i).toDouble * vb.getFloat(j).toDouble; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (nx, ny, i, j, s) = (ctx.freshName("nx"), ctx.freshName("ny"),
      ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("s"))
    val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
    nullSafeCodeGen(ctx, ev, (ia, va, ib, vb) =>
      s"""
         |int $nx = $ia.numElements(), $ny = $ib.numElements();
         |int $i = 0, $j = 0; double $s = 0.0;
         |while ($i < $nx && $j < $ny) {
         |  int $x = $ia.getInt($i); int $y = $ib.getInt($j);
         |  if ($x == $y) { $s += (double) $va.getFloat($i) * (double) $vb.getFloat($j); $i++; $j++; }
         |  else if ($x < $y) $i++; else $j++;
         |}
         |${ev.value} = $s;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression, d: Expression): Expression =
    copy(xi = a, xv = b, yi = c, yv = d)
}

/** Sparse Euclidean distance — unmatched indices contribute their own
  * square (the other side is an implicit zero there).
  */
case class SparseL2(xi: Expression, xv: Expression, yi: Expression, yv: Expression)
    extends SparseBinaryExpression {
  override def prettyName: String = "sparse_l2"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val (ia, va) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ib, vb) = (c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
    val (nx, ny) = (ia.numElements(), ib.numElements())
    var i = 0; var j = 0; var s = 0.0
    while (i < nx && j < ny) {
      val x = ia.getInt(i); val y = ib.getInt(j)
      if (x == y) {
        val dd = va.getFloat(i).toDouble - vb.getFloat(j).toDouble; s += dd * dd; i += 1; j += 1
      } else if (x < y) {
        val dd = va.getFloat(i).toDouble; s += dd * dd; i += 1
      } else {
        val dd = vb.getFloat(j).toDouble; s += dd * dd; j += 1
      }
    }
    while (i < nx) { val dd = va.getFloat(i).toDouble; s += dd * dd; i += 1 }
    while (j < ny) { val dd = vb.getFloat(j).toDouble; s += dd * dd; j += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (nx, ny, i, j, s) = (ctx.freshName("nx"), ctx.freshName("ny"),
      ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("s"))
    val (x, y, dd) = (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("dd"))
    nullSafeCodeGen(ctx, ev, (ia, va, ib, vb) =>
      s"""
         |int $nx = $ia.numElements(), $ny = $ib.numElements();
         |int $i = 0, $j = 0; double $s = 0.0;
         |while ($i < $nx && $j < $ny) {
         |  int $x = $ia.getInt($i); int $y = $ib.getInt($j);
         |  double $dd;
         |  if ($x == $y) { $dd = (double) $va.getFloat($i) - (double) $vb.getFloat($j); $i++; $j++; }
         |  else if ($x < $y) { $dd = (double) $va.getFloat($i); $i++; }
         |  else { $dd = (double) $vb.getFloat($j); $j++; }
         |  $s += $dd * $dd;
         |}
         |while ($i < $nx) { double $dd = (double) $va.getFloat($i); $s += $dd * $dd; $i++; }
         |while ($j < $ny) { double $dd = (double) $vb.getFloat($j); $s += $dd * $dd; $j++; }
         |${ev.value} = Math.sqrt($s);
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression, d: Expression): Expression =
    copy(xi = a, xv = b, yi = c, yv = d)
}

/** Sparse cosine similarity (norms over each side's own values). */
case class SparseCosine(xi: Expression, xv: Expression, yi: Expression, yv: Expression)
    extends SparseBinaryExpression {
  override def prettyName: String = "sparse_cosine"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val (ia, va) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ib, vb) = (c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
    val (nx, ny) = (ia.numElements(), ib.numElements())
    var i = 0; var j = 0; var dot = 0.0
    while (i < nx && j < ny) {
      val x = ia.getInt(i); val y = ib.getInt(j)
      if (x == y) { dot += va.getFloat(i).toDouble * vb.getFloat(j).toDouble; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    var sx = 0.0; i = 0
    while (i < nx) { val v = va.getFloat(i).toDouble; sx += v * v; i += 1 }
    var sy = 0.0; j = 0
    while (j < ny) { val v = vb.getFloat(j).toDouble; sy += v * v; j += 1 }
    val denom = math.sqrt(sx) * math.sqrt(sy)
    if (denom == 0.0) 0.0 else dot / denom
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (nx, ny, i, j) = (ctx.freshName("nx"), ctx.freshName("ny"),
      ctx.freshName("i"), ctx.freshName("j"))
    val (x, y, v, dot, sx, sy, denom) = (ctx.freshName("x"), ctx.freshName("y"),
      ctx.freshName("v"), ctx.freshName("dot"), ctx.freshName("sx"),
      ctx.freshName("sy"), ctx.freshName("denom"))
    nullSafeCodeGen(ctx, ev, (ia, va, ib, vb) =>
      s"""
         |int $nx = $ia.numElements(), $ny = $ib.numElements();
         |int $i = 0, $j = 0; double $dot = 0.0;
         |while ($i < $nx && $j < $ny) {
         |  int $x = $ia.getInt($i); int $y = $ib.getInt($j);
         |  if ($x == $y) { $dot += (double) $va.getFloat($i) * (double) $vb.getFloat($j); $i++; $j++; }
         |  else if ($x < $y) $i++; else $j++;
         |}
         |double $sx = 0.0;
         |for ($i = 0; $i < $nx; $i++) { double $v = (double) $va.getFloat($i); $sx += $v * $v; }
         |double $sy = 0.0;
         |for ($j = 0; $j < $ny; $j++) { double $v = (double) $vb.getFloat($j); $sy += $v * $v; }
         |double $denom = Math.sqrt($sx) * Math.sqrt($sy);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
                                                 c: Expression, d: Expression): Expression =
    copy(xi = a, xv = b, yi = c, yv = d)
}

/** Column-API facade. */
object sparse {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def sparse_dot(xi: Column, xv: Column, yi: Column, yv: Column): Column =
    col(SparseDot(ex(xi), ex(xv), ex(yi), ex(yv)))
  def sparse_l2(xi: Column, xv: Column, yi: Column, yv: Column): Column =
    col(SparseL2(ex(xi), ex(xv), ex(yi), ex(yv)))
  def sparse_cosine(xi: Column, xv: Column, yi: Column, yv: Column): Column =
    col(SparseCosine(ex(xi), ex(xv), ex(yi), ex(yv)))
}
