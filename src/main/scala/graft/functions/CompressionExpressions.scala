package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text-quality kernel (D22): DEFLATE output size
  * per document. Highly repetitive or templated text compresses far
  * below natural prose — the gzip-ratio junk signal the public
  * pretraining pipelines ship (Dolma's and RedPajama's quality
  * taggers both carry a per-doc compression field). DEFLATE at a
  * fixed level with no dictionary is fully deterministic, so the
  * kernel is exactly reproducible (spec re-runs the identical
  * Deflater on the driver); DuckDB has no deflate, so the query key
  * is rows-only.
  */
object CompressionKernels {
  /** Deflated byte count of the UTF-8 bytes at the given level.
    * Thread-safe: one Deflater per call — the allocation is dwarfed by
    * the compression work itself at document sizes.
    */
  def deflateSize(s: UTF8String, level: Int): Long = {
    val in = s.getBytes
    val d = new Deflater(level, /* nowrap = */ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `deflate_size(text, level) -> bigint` — deflated byte count. */
case class DeflateSize(child: Expression, level: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "deflate_size"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    CompressionKernels.deflateSize(a.asInstanceOf[UTF8String], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressionKernels.deflateSize($c, $level)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object compression {
  def deflate_size(text: Column, level: Int = 6): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(text), level))
}
