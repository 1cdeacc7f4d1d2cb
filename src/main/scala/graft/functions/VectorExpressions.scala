package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` columns.
  *
  * The reference computes pgvector's `<->` (L2), `<#>` (negative inner
  * product) and `<=>` (cosine distance) inside the scan
  * (see /root/reference/basic_benchmark/common_function.py:139, pgvector
  * operators). Here they are whole-stage-codegen scalar expressions: a
  * tight primitive loop over `ArrayData`, no boxing, no UDF serialization —
  * this is the hot inner loop of every ANN scan, so it must stay inside
  * WholeStageCodegen at 100 TB scale.
  *
  * All generated locals come from `ctx.freshName`: janino scopes
  * for-init declarations to the enclosing block, so two kernel instances
  * in one projection would otherwise collide ("redefinition of local
  * variable") and silently fall back to interpreted eval.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  // return type inferred — AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Scalar kernel over two equal-length float arrays. */
  protected def kernel(x: ArrayData, y: ArrayData): Double

  /** Java source for the loop body; `x`/`y` are ArrayData, result into `result`. */
  protected def genLoop(ctx: CodegenContext, x: String, y: String, result: String): String

  override protected def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => genLoop(ctx, x, y, ev.value.toString))
}

/** Euclidean distance — pgvector `<->`. */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance"
  protected def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); var i = 0; var s = 0.0
    // Double subtraction to match the generated code bit-for-bit (a
    // Float subtraction can flip top-k ties between eval paths)
    while (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s += d * d; i += 1 }
    math.sqrt(s)
  }
  protected def genLoop(ctx: CodegenContext, x: String, y: String, result: String): String = {
    val (n, s, i, d) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("d"))
    s"""
       |int $n = $x.numElements();
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
       |  $s += $d * $d;
       |}
       |$result = Math.sqrt($s);
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared Euclidean distance (cheaper when only ordering matters). */
case class L2DistanceSq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2_distance_sq"
  protected def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); var i = 0; var s = 0.0
    // Double subtraction to match codegen (see L2Distance)
    while (i < n) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s += d * d; i += 1 }
    s
  }
  protected def genLoop(ctx: CodegenContext, x: String, y: String, result: String): String = {
    val (n, s, i, d) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("d"))
    s"""
       |int $n = $x.numElements();
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
       |  $s += $d * $d;
       |}
       |$result = $s;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Manhattan (taxicab) distance — pgvector `<+>` (vector.c:729
  * l1_distance). Completes the dense distance family alongside
  * L2/inner-product/cosine.
  */
case class L1Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l1_distance"
  protected def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); var i = 0; var s = 0.0
    while (i < n) { s += math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble); i += 1 }
    s
  }
  protected def genLoop(ctx: CodegenContext, x: String, y: String, result: String): String = {
    val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
    s"""
       |int $n = $x.numElements();
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $s += Math.abs((double) $x.getFloat($i) - (double) $y.getFloat($i));
       |}
       |$result = $s;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Inner product — pgvector `<#>` is its negation. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  protected def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); var i = 0; var s = 0.0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
    s
  }
  protected def genLoop(ctx: CodegenContext, x: String, y: String, result: String): String = {
    val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
    s"""
       |int $n = $x.numElements();
       |double $s = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
       |}
       |$result = $s;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity — pgvector `<=>` is `1 - this`. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  protected def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements(); var i = 0
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    while (i < n) {
      val a = x.getFloat(i).toDouble; val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }
  protected def genLoop(ctx: CodegenContext, x: String, y: String, result: String): String = {
    val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
    val (dot, nx, ny) = (ctx.freshName("dot"), ctx.freshName("nx"), ctx.freshName("ny"))
    val (a, b, denom) = (ctx.freshName("a"), ctx.freshName("b"), ctx.freshName("denom"))
    s"""
       |int $n = $x.numElements();
       |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $a = (double) $x.getFloat($i);
       |  double $b = (double) $y.getFloat($i);
       |  $dot += $a * $b; $nx += $a * $a; $ny += $b * $b;
       |}
       |double $denom = Math.sqrt($nx) * Math.sqrt($ny);
       |$result = ($denom == 0.0) ? 0.0 : $dot / $denom;
     """.stripMargin
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a single vector. */
case class VectorNorm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "vector_norm"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements(); var i = 0; var s = 0.0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, s, i, v) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("v"))
    nullSafeCodeGen(ctx, ev, x =>
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $v = (double) $x.getFloat($i); $s += $v * $v; }
         |${ev.value} = Math.sqrt($s);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** argmin_c ||v - centroid_c||² against a small centroid matrix baked
  * into the expression — the IVF assignment kernel. One pass per row,
  * no join, no aggregation; usable identically in batch and streaming
  * plans (streaming can't chain an argmin aggregation under a count).
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "nearest_centroid"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var s = 0.0; var i = 0
      val n = math.min(dim, cent.length)
      // subtract in Double exactly like the generated code — a Float
      // subtraction here can differ in the last ulp and flip argmin
      // cell assignments near ties between this path and codegen
      while (i < n) { val d = v.getFloat(i).toDouble - cent(i).toDouble; s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }
  // the centroid matrix rides along as a codegen reference object — the
  // argmin loop stays inside WholeStageCodegen (this expression sits in
  // the scan stage of every IVF build/search plan)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val (cm, dim) = (ctx.freshName("cents"), ctx.freshName("dim"))
    val (best, bestD) = (ctx.freshName("best"), ctx.freshName("bestD"))
    val (c, cent, n, s, i, d) = (ctx.freshName("c"), ctx.freshName("cent"),
      ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("d"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |float[][] $cm = $cents;
         |int $dim = $v.numElements();
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $cm.length; $c++) {
         |  float[] $cent = $cm[$c];
         |  int $n = Math.min($dim, $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $v.getFloat($i) - (double) $cent[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** L2 distance to EVERY centroid of a small baked-in matrix —
  * `array<double>` indexed by centroid id. The per-cell companion of
  * NearestCentroid: posexplode(centroid_dists(v)) yields the
  * (cell, d(v, cell)) rows that triangle-inequality cell pruning runs
  * on, without any join against a centroid table.
  */
case class CentroidDistances(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "centroid_dists"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var s = 0.0; var i = 0
      val n = math.min(dim, cent.length)
      // Double subtraction to match codegen bit-for-bit (see NearestCentroid)
      while (i < n) { val d = v.getFloat(i).toDouble - cent(i).toDouble; s += d * d; i += 1 }
      out(c) = math.sqrt(s)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val (cm, dim, out) = (ctx.freshName("cents"), ctx.freshName("dim"), ctx.freshName("out"))
    val (c, cent, n, s, i, d) = (ctx.freshName("c"), ctx.freshName("cent"),
      ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("d"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |float[][] $cm = $cents;
         |int $dim = $v.numElements();
         |double[] $out = new double[$cm.length];
         |for (int $c = 0; $c < $cm.length; $c++) {
         |  float[] $cent = $cm[$c];
         |  int $n = Math.min($dim, $cent.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $v.getFloat($i) - (double) $cent[$i];
         |    $s += $d * $d;
         |  }
         |  $out[$c] = Math.sqrt($s);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Chebyshev (L∞) distance over two `array<double>` columns — the
  * multi-pivot triangle lower bound of the exact kNN build: for pivot
  * distance arrays zₐ[i] = d(a, pᵢ), z_b[i] = d(b, pᵢ), the triangle
  * inequality gives max_i |zₐ[i] − z_b[i]| ≤ d(a, b), so any pair whose
  * pivot gap exceeds the per-src kth-NN upper bound can skip the
  * full-dimension kernel losslessly (LAESA-style pruning; the pivots
  * are the IVF centroids whose distance arrays `centroid_dists`
  * already computes). 16 double ops per pair vs a 64-dim kernel +
  * heap update — this runs on every joined candidate pair, so it is
  * codegen'd like the kernels it guards.
  */
case class ChebyshevDoubles(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "linf_dist_d"
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var m = 0.0
    while (i < n) {
      val d = math.abs(x.getDouble(i) - y.getDouble(i))
      if (d > m) m = d
      i += 1
    }
    m
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, m, i, d) = (ctx.freshName("n"), ctx.freshName("m"), ctx.freshName("i"), ctx.freshName("d"))
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = Math.abs($x.getDouble($i) - $y.getDouble($i));
         |  if ($d > $m) $m = $d;
         |}
         |${ev.value} = $m;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unit-normalize a float vector (zero vector stays zero). Cosine
  * geometry becomes L2 geometry on the output: cos(x,y) ≥ τ iff
  * ‖x̂−ŷ‖ ≤ √(2−2τ) — which is what lets the IVF cell machinery block
  * cosine near-dup joins losslessly.
  */
case class VectorNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "vec_normalize"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; s += x * x; i += 1 }
    val inv = if (s == 0.0) 0.0 else 1.0 / math.sqrt(s)
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = (v.getFloat(i) * inv).toFloat; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, s, i, j, x, inv, out) = (ctx.freshName("n"), ctx.freshName("s"),
      ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("x"),
      ctx.freshName("inv"), ctx.freshName("out"))
    nullSafeCodeGen(ctx, ev, v =>
      s"""
         |int $n = $v.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = (double) $v.getFloat($i); $s += $x * $x; }
         |double $inv = ($s == 0.0) ? 0.0 : 1.0 / Math.sqrt($s);
         |float[] $out = new float[$n];
         |for (int $j = 0; $j < $n; $j++) { $out[$j] = (float) ($v.getFloat($j) * $inv); }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API facade, mirroring `org.apache.spark.sql.functions`. */
object vector {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def l2_dist(a: Column, b: Column): Column    = col(L2Distance(ex(a), ex(b)))
  def l1_dist(a: Column, b: Column): Column    = col(L1Distance(ex(a), ex(b)))
  def l2_dist_sq(a: Column, b: Column): Column = col(L2DistanceSq(ex(a), ex(b)))
  def dot(a: Column, b: Column): Column        = col(DotProduct(ex(a), ex(b)))
  def cosine_sim(a: Column, b: Column): Column = col(CosineSimilarity(ex(a), ex(b)))
  def vec_norm(a: Column): Column              = col(VectorNorm(ex(a)))
  def nearest_centroid(v: Column, cents: Array[Array[Float]]): Column =
    col(NearestCentroid(ex(v), cents))
  def centroid_dists(v: Column, cents: Array[Array[Float]]): Column =
    col(CentroidDistances(ex(v), cents))
  def vec_normalize(v: Column): Column = col(VectorNormalize(ex(v)))
  def linf_dist_d(a: Column, b: Column): Column = col(ChebyshevDoubles(ex(a), ex(b)))
}
