package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._
import graft.operators.TopKByScore

/** Session extension registering the engine's functions for SQL use:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT l2_dist(embedding, qvec) FROM ...")
  * }}}
  *
  * This is the library's `spark.sql(...)` API surface — a user of the
  * reference's SQL operators (`vector <-> q`, etc. — pgvector SQL) gets
  * the same capability spelled as functions. Also installable into an
  * existing session via `GraftExtensions.install(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, builder) =>
      e.injectFunction(
        (new FunctionIdentifier(name),
          new ExpressionInfo("graft", name),
          builder))
    }
}

object GraftExtensions {
  private def one(f: Expression => Expression): Seq[Expression] => Expression =
    es => f(es.head)
  private def two(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    es => f(es(0), es(1))

  val registrations: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_dist" -> two(L2Distance),
    "l2_dist_sq" -> two(L2DistanceSq),
    "dot_product" -> two(DotProduct),
    "cosine_sim" -> two(CosineSimilarity),
    "vec_norm" -> one(VectorNorm),
    "vec_normalize" -> one(VectorNormalize),
    "simhash64" -> one(SimHash64),
    "rolling_hash" -> one(RollingHash),
    "char_ngrams_5" -> one(CharNGrams(_, 5)),
    "word_shingles_3" -> one(WordNShingles(_, 3)),
    "sorted_jaccard" -> two(SortedJaccard),
    // topk_ids(score, id) with k=10 — SQL surface for the bounded-heap agg
    "topk10_ids" -> two((s, i) => TopKByScore(s, i, 10).toAggregateExpression()),
    // round-4 kernels
    "repetition_stats" -> one(RepetitionStats),
  )

  /** Register the same functions into an already-built session. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
