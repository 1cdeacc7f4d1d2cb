package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.functions.hashes._
import graft.functions.vector._

/** Deduplication operators over `documents` (SURVEY.md §2.C) — the
  * LLM-training-pipeline surface. The corpus here is small; the shapes
  * are the at-scale ones:
  *   - exact dedup: one hash-shuffle (groupBy content hash);
  *   - MinHash LSH: shingle → signature → band-bucket shuffle → verify,
  *     the standard near-linear near-dup join (vs the quadratic exact
  *     pairwise, kept as the oracle baseline);
  *   - SimHash: 64-bit sketch + banded hamming join.
  */
object Dedup {

  /** Words of a document (single-space tokenization, mirrored in SQL). */
  private def words(c: Column): Column = split(c, " ")

  /** Distinct word n-shingles: `w[i] … w[i+n-1]` (1-based element_at,
    * mirroring DuckDB's 1-based list indexing). Guarded: Spark's
    * sequence(1, 0) counts DOWN, so short docs must short-circuit to [].
    */
  private[graft] def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))
    when(size(ws) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  private[graft] def shingles3(text: Column): Column = wordShingles(text, 3)

  /** C1: exact dedup via content hash — every doc with its group size
    * and the canonical (minimum) doc id of its group.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("n_dups", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .select("doc_id", "h", "n_dups", "keep_id")
      .orderBy("doc_id")

  /** Word-3-shingle sets per doc (shared by C2 oracle-verify and C4). */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles3(col("text")).as("s"))
      .filter(size(col("s")) > 0)

  /** C2: MinHash-LSH near-dup pairs, exact-verified.
    *
    * Pipeline (the at-scale one): 64 minhashes from the shingle set →
    * 16 bands × 4 rows → explode band keys → self-join on band key
    * (the ONLY shuffle touches `docs × 16` rows, never pairs) →
    * candidate pairs → exact Jaccard verify ≥ 0.8.
    *
    * With sims ≥ 0.9 in this corpus, 16×4 banding has recall ~1-1e-7,
    * so the verified output equals the exact pairwise result — which is
    * what the DuckDB oracle computes.
    */
  def minhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingleSets(spark, dir)
    val numHashes = 64
    val bands = 16
    val rowsPerBand = numHashes / bands
    // signature[i] = min over shingles of token_hash64(s, seed=i)
    val withSig = sh.withColumn("sig",
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(col("s"), s => token_hash64Expr(s, i)))))
    val banded = withSig.select(
      col("doc_id"), col("s"),
      posexplode(array((0 until bands).map(bnd =>
        xxhash64(slice(col("sig"), bnd * rowsPerBand + 1, rowsPerBand), lit(bnd))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc1"), col("s").as("s1"))
    val b = banded.select(col("band"), col("band_key"),
      col("doc_id").as("doc2"), col("s").as("s2"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2", "s1", "s2").distinct()
      .withColumn("jaccard", round(
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
      .orderBy("doc1", "doc2")
  }

  // transform's lambda variable is a Column; thread the seed through.
  private def token_hash64Expr(s: Column, seed: Column): Column = {
    // hash64(s + seed) composed from the registered scalar: emulate the
    // per-seed family by hashing (seed, token) with the built-in
    // xxhash64 — codegen'd, seed folds in as a literal column.
    xxhash64(seed, s)
  }

  /** C3: SimHash near-dup pairs (custom sketch expression + banded
    * hamming join). Pairs with hamming distance ≤ maxHamming over
    * 64-bit simhash of word bigrams. Rows-only (hash family is
    * engine-specific).
    */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sigs = docs.select(col("doc_id"), simhash64(wordShingles(col("text"), 2)).as("sig"))
    // 4 bands × 16 bits: ≤3 differing bits leave ≥1 band identical.
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(bnd =>
        shiftrightunsigned(col("sig"), bnd * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.select(col("band"), col("band_key"), col("doc_id").as("doc1"), col("sig").as("sig1"))
    val b = banded.select(col("band"), col("band_key"), col("doc_id").as("doc2"), col("sig").as("sig2"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc1") < col("doc2"))
      .select("doc1", "doc2", "sig1", "sig2").distinct()
      .withColumn("hamming", bit_count(col("sig1").bitwiseXOR(col("sig2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc1"), col("doc2"), col("hamming").cast("int").as("hamming"))
      .orderBy("doc1", "doc2")
  }

  /** C4: exact character-3-gram Jaccard pairs — the quadratic baseline
    * the LSH paths approximate (oracle-checkable; at 100 TB this is the
    * query you DON'T run, which is the point of C2/C3).
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val g = Tables.documents(spark, dir).select(
      col("doc_id"),
      array_distinct(transform(
        sequence(lit(1), greatest(length(col("text")) - 2, lit(1))),
        i => col("text").substr(i, lit(3)))).as("g"))
    val a = g.select(col("doc_id").as("doc1"), col("g").as("g1"))
    val b = g.select(col("doc_id").as("doc2"), col("g").as("g2"))
    a.crossJoin(b)
      .filter(col("doc1") < col("doc2"))
      .withColumn("jaccard", round(
        size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2"))), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc1", "doc2", "jaccard")
      .orderBy("doc1", "doc2")
  }

  /** C5: embedding-cosine similar-pair mining (cos ≥ tau). Exact
    * pairwise here; the IVF/LSH ANN paths (§2.B) are the blocking
    * strategy at scale.
    */
  def embeddingPairs(spark: SparkSession, dir: String, tau: Double = 0.45): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val a = e.select(col("vec_id").as("vec1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("vec2"), col("embedding").as("e2"))
    a.crossJoin(b)
      .filter(col("vec1") < col("vec2"))
      .withColumn("cos_sim", round(cosine_sim(col("e1"), col("e2")), 4))
      .filter(col("cos_sim") >= tau)
      .select("vec1", "vec2", "cos_sim")
      .orderBy("vec1", "vec2")
  }
}
