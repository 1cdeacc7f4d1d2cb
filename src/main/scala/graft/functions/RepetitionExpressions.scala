package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `repetition_stats(text) -> array<double>` — the Gopher-style
  * repetition signals (Rae et al. 2021, §A1.1: "repetitious documents
  * are low quality") in ONE imperative pass per row, no shuffle, no
  * per-element lambda dispatch:
  *
  *   [0] n_words          (single-space tokenization, empties kept —
  *                         same convention as every other text kernel)
  *   [1] top_word_frac    max single-word count / n_words
  *   [2] top_bigram_frac  max bigram count / (n_words − 1)
  *   [3] dup_trigram_frac 1 − distinct trigrams / (n_words − 2)
  *
  * Degenerate guards (0 when the denominator would be ≤ 0) are
  * mirrored by the DuckDB oracle's CASE arms. Counting is over the
  * literal gram STRINGS (java HashMap per row), not 64-bit hashes —
  * exactness is the point of an oracle-checked quality gate, and a
  * row's gram table is tiny (bounded by the doc's word count) and
  * never escapes the row.
  */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "repetition_stats"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any): Any = {
    val words = a.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = words.length
    val wc = new java.util.HashMap[String, Int]()
    var maxW = 0
    var i = 0
    while (i < n) {
      val c = wc.merge(words(i), 1, Integer.sum)
      if (c > maxW) maxW = c
      i += 1
    }
    val bc = new java.util.HashMap[String, Int]()
    var maxB = 0
    i = 0
    while (i + 1 < n) {
      val c = bc.merge(words(i) + " " + words(i + 1), 1, Integer.sum)
      if (c > maxB) maxB = c
      i += 1
    }
    val tri = new java.util.HashSet[String]()
    i = 0
    while (i + 2 < n) {
      tri.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val topWord = if (n > 0) maxW.toDouble / n else 0.0
    val topBigram = if (n > 1) maxB.toDouble / (n - 1) else 0.0
    val dupTrigram = if (n > 2) 1.0 - tri.size.toDouble / (n - 2) else 0.0
    new GenericArrayData(Array[Any](n.toDouble, topWord, topBigram, dupTrigram))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object repetition {
  def repetition_stats(text: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(text)))
}
