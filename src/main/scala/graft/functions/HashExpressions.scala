package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-hashing Catalyst expressions for the dedup / fingerprint
  * operators (SURVEY.md §2 C3, D4).
  */
object HashKernels {
  /** splitmix64 finalizer — a well-mixed public-domain 64-bit hash. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of a UTF-8 string: polynomial over bytes, then mix. */
  def hashUtf8(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    mix64(h)
  }

  /** SimHash over a bag of tokens: per-token 64-bit hash votes per bit;
    * final bit b = sign of the vote sum (Charikar 2002).
    */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hashUtf8(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Rolling polynomial fingerprint over unicode codepoints, mod the
    * Mersenne prime 2^31-1 (value fits in 36 bits before each mod, so
    * the arithmetic is exactly reproducible in any engine with 64-bit
    * integers — the DuckDB oracle replays it with list_reduce).
    */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }
}

/** `simhash64(array<string>) -> bigint` (eval-mode; the per-token loop
  * dominates, codegen of the outer call adds nothing measurable).
  */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "simhash64"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    HashKernels.simhash(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `rolling_hash(string) -> bigint` — D4 document fingerprint. */
case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "rolling_hash"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    HashKernels.rollingHash(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object hashes {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def simhash64(tokens: Column): Column = col(SimHash64(ex(tokens)))
  def rolling_hash(text: Column): Column = col(RollingHash(ex(text)))
}
