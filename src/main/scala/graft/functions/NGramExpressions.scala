package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{GraftInternal => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenization kernels.
  *
  * The built-in route (`transform(sequence(...), i -> substr/concat)`)
  * runs the lambda through Catalyst's INTERPRETED HigherOrderFunction
  * path — per-element closure dispatch and boxing. These expressions do
  * one imperative pass per row instead; on the 5 000-doc corpus that is
  * the difference between ~14 s and sub-second for the shingle-heavy
  * dedup/text queries. Semantics stay exactly SQL-replayable (the
  * DuckDB oracles keep using list_transform).
  */

/** Distinct character n-grams of a string: substr(text, i, n) for
  * i ∈ [1, max(len-n+1, 1)], first-seen order (matches the
  * list_distinct(list_transform(range ...)) oracle formulation).
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "char_ngrams"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val len = s.numChars()
    val upper = math.max(len - n + 1, 1)
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i < upper) { seen.add(s.substringSQL(i + 1, n)); i += 1 }
    new GenericArrayData(seen.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct word n-shingles (single-space tokenization, space-joined),
  * [] when the doc has fewer than n words — matches the guarded
  * `wordShingles` / oracle list_transform formulation.
  */
case class WordNShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "word_nshingles"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val words = a.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NGramKernels {
  /** Sorted, deduped 64-bit hashes of a token array. */
  def sortedHashes(raw: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(raw)
    var w = 0
    var i = 0
    while (i < raw.length) {
      if (w == 0 || raw(w - 1) != raw(i)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(raw, w)
  }

  def charGramHashes(s: UTF8String, n: Int): Array[Long] = {
    val len = s.numChars()
    val upper = math.max(len - n + 1, 1)
    val raw = new Array[Long](upper)
    var i = 0
    while (i < upper) {
      raw(i) = HashKernels.hashUtf8(s.substringSQL(i + 1, n)); i += 1
    }
    sortedHashes(raw)
  }

  def wordShingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val words = s.toString.split(" ", -1)
    if (words.length < n) return Array.emptyLongArray
    val raw = new Array[Long](words.length - n + 1)
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      raw(i) = HashKernels.hashUtf8(UTF8String.fromString(sb.toString))
      i += 1
    }
    sortedHashes(raw)
  }

  /** MinHash signature array from token hashes (codegen entry point). */
  def minhashSigs(hs: ArrayData, numSigs: Int): Array[Long] = {
    val sigs = Array.fill(numSigs)(Long.MaxValue)
    val nTok = hs.numElements()
    var t = 0
    while (t < nTok) {
      val h = hs.getLong(t)
      var i = 0
      while (i < numSigs) {
        val m = HashKernels.mix64(h + i * 0x9e3779b97f4a7c15L)
        if (m < sigs(i)) sigs(i) = m
        i += 1
      }
      t += 1
    }
    sigs
  }

  /** Jaccard of two sorted-hash sets (codegen entry point). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val inter = intersectSize(a, b)
    val union = a.numElements() + b.numElements() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** |a ∩ b| via merge scan of two sorted long arrays. */
  def intersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Sorted deduped char-n-gram hashes — the set representation the whole
  * dedup pipeline runs on (minhash input AND exact-verify input), no
  * gram strings ever materialized.
  */
case class CharNGramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "char_ngram_hashes"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(NGramKernels.charGramHashes(a.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.NGramKernels.charGramHashes($c, $n))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sorted deduped word-n-shingle hashes. */
case class WordNShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "word_nshingle_hashes"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(NGramKernels.wordShingleHashes(a.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.NGramKernels.wordShingleHashes($c, $n))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signatures from precomputed token hashes (splitmix remixes). */
case class MinHashSigsLong(child: Expression, numSigs: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "minhash_sigs_long"
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val sigs = Array.fill(numSigs)(Long.MaxValue)
    val nTok = hs.numElements()
    var t = 0
    while (t < nTok) {
      val h = hs.getLong(t)
      var i = 0
      while (i < numSigs) {
        val m = HashKernels.mix64(h + i * 0x9e3779b97f4a7c15L)
        if (m < sigs(i)) sigs(i) = m
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sigs)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.NGramKernels.minhashSigs($c, $numSigs))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard of two sorted-hash sets: merge-scan intersection,
  * |a∪b| = |a|+|b|-|a∩b|. Primitive long comparisons — the verify
  * kernel of the dedup pipeline.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def prettyName: String = "sorted_jaccard"
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val inter = NGramKernels.intersectSize(x, y)
    val union = x.numElements() + y.numElements() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NGramKernels.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ngrams {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def ex(c: Column): Expression = ExpressionUtils.expression(c)

  def char_ngrams(text: Column, n: Int): Column = col(CharNGrams(ex(text), n))
  def word_nshingles(text: Column, n: Int): Column = col(WordNShingles(ex(text), n))
  def char_ngram_hashes(text: Column, n: Int): Column = col(CharNGramHashes(ex(text), n))
  def word_nshingle_hashes(text: Column, n: Int): Column = col(WordNShingleHashes(ex(text), n))
  def minhash_sigs_long(hashes: Column, numSigs: Int): Column = col(MinHashSigsLong(ex(hashes), numSigs))
  def sorted_jaccard(a: Column, b: Column): Column = col(SortedJaccard(ex(a), ex(b)))
}
