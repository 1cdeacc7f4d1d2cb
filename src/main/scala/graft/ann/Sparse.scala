package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.sparse._

/** Sparse-vector surface (pgvector src/sparsevec.c): vectors as
  * (indices, values) pairs, searched with the merge-scan kernels in
  * functions.SparseExpressions.
  *
  * The testdata ships dense embeddings, so the sparse frame is DERIVED
  * deterministically — keep dimensions with value > `thresh` — which
  * is both a real sparsifier (magnitude pruning, the standard
  * bag-of-features compaction) and exactly replayable in the DuckDB
  * oracle. The derivation uses only codegen'd higher-order builtins
  * (filter/transform over a sequence), no UDF.
  *
  * At 100 TB the sparse pair columns ARE the stored representation
  * (parquet encodes the two small arrays; scan bytes ∝ nnz, not dim)
  * and the top-k is the same broadcast-query + TakeOrderedAndProject
  * shape as every dense search here.
  */
object Sparse {

  val Dim = 64

  /** (vec_id, idx: array<int>, val: array<float>) — indices sorted
    * ascending by construction (filter preserves sequence order).
    */
  def sparsify(spark: SparkSession, dir: String, thresh: Double = 0.75): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr(s"filter(sequence(0, ${Dim - 1}), i -> embedding[i] > ${thresh}D)").as("sidx"),
        expr(s"transform(filter(sequence(0, ${Dim - 1}), i -> embedding[i] > ${thresh}D), i -> embedding[i])")
          .as("sval"))

  /** Exact sparse max-inner-product top-k against the sparsified query
    * (vec_id 0) — output (vec_id, dot rounded 4dp), fully
    * oracle-checked: the dot only sums dims where BOTH sides survive
    * the sparsifier, which DuckDB replays per dimension.
    */
  def sparseTopK(spark: SparkSession, dir: String, k: Int = 10,
                 qid: Long = 0, thresh: Double = 0.75): DataFrame = {
    val s = sparsify(spark, dir, thresh)
    val q = s.filter(col("vec_id") === qid)
      .select(col("sidx").as("qidx"), col("sval").as("qval"))
    s.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .withColumn("dot", round(sparse_dot(col("sidx"), col("sval"),
        col("qidx"), col("qval")), 4))
      .orderBy(col("dot").desc, col("vec_id"))
      .limit(k)
      .select("vec_id", "dot")
  }
}
