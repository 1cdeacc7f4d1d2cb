package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(long) -> boolean` against a plan-time-constant
  * Bloom filter (carried SERIALIZED — `Array[Byte]` survives any plan
  * shipping; the filter object is rebuilt lazily per JVM).
  *
  * Purpose: shrink the shipped set-membership dictionary. A distinct
  * hash set broadcasts 8 B/element plus hash-table overhead; a 1%-fpp
  * Bloom filter is ~1.2 B/element — an order of magnitude fewer bytes
  * to every executor. No false negatives, so an EXACT gate stays exact
  * as long as candidates are re-verified against the true set (see
  * Dedup.decontaminateBloom).
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "bloom_might_contain"
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(a: Any): Any =
    filter.mightContainLong(a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the EXPRESSION (serializable via filterBytes) and reach
    // its lazily-rebuilt filter — never the BloomFilter object itself
    val self = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.mightContain($v);")
  }

  /** Codegen entry point (public for the generated class). */
  def mightContain(v: Long): Boolean = filter.mightContainLong(v)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object bloom {
  def bloom_might_contain(v: Column, filterBytes: Array[Byte]): Column =
    ExpressionUtils.column(BloomMightContain(ExpressionUtils.expression(v), filterBytes))
}
