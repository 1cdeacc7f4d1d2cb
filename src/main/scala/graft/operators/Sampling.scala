package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables

/** Stratified / mixture sampling — the data-mixing step every training
  * pipeline runs before tokenization (pick X% of each source/language
  * so the mixture matches a target recipe; reference analogue: the
  * per-role workload draws in benchmark/initialize_dynamic_partition.py,
  * which sample a fixed quota per stratum).
  *
  * Two paths, both DETERMINISTIC (a doc's membership never changes when
  * the corpus grows, reshards, or re-orders — same property as
  * `TextOps.trainSplit`, and the one that makes samples reproducible
  * and auditable across dataset versions):
  *
  *  - `mixtureByHash`: per-stratum Bernoulli by multiplicative hash —
  *    a pure FILTER, no shuffle at all, rate accurate to ±O(1/√n).
  *    This is the 100 TB default: it composes with any downstream
  *    shuffle and reads each row exactly once.
  *  - `stratifiedExact`: exact per-stratum quota (ceil(n·pct/100)) —
  *    per-stratum counts (one agg) + hash-ordered `row_number` ≤ quota
  *    (one window). The window sort is per-stratum and spillable, the
  *    same shape the exact-quantile operator uses; use it when the
  *    quota must be exact (eval-set construction), the hash path when
  *    it only has to be close (mixture weighting).
  *
  * The order/selection key is an overflow-free multiplicative hash:
  * (doc_id mod 1000003)·2654435761 mod 1000000007 — max product
  * ~2.65e15, far inside BIGINT for ANY doc id, so Spark, ANSI Spark and
  * the DuckDB oracle compute bit-identical keys (a raw 64-bit multiply
  * would wrap/raise past doc_id ≈ 3.5e9). Ties (ids congruent mod
  * 1000003) are broken by doc_id, keeping the order total.
  */
object Sampling {

  private val P1 = 1000003L      // order-key premodulus (keeps the product small)
  private val KNUTH = 2654435761L
  private val P2 = 1000000007L   // order-key range

  /** The deterministic per-row sort/selection key. */
  def hashKey(id: Column): Column =
    pmod(pmod(id, lit(P1)) * lit(KNUTH), lit(P2))

  /** Per-stratum Bernoulli sample: keep a row iff hashKey mod 10000
    * falls under its stratum's rate (permil of 10000). Zero-shuffle
    * scale path; unspecified strata are dropped (rate 0).
    */
  def mixtureByHash(df: DataFrame, idCol: String, stratumCol: String,
                    ratesBp: Map[String, Int]): DataFrame = {
    val rate = ratesBp.foldLeft(lit(0)) { case (acc, (s, bp)) =>
      when(col(stratumCol) === s, lit(bp)).otherwise(acc)
    }
    df.filter(pmod(hashKey(col(idCol)), lit(10000L)) < rate)
  }

  /** Exact per-stratum quota sample: the ceil(n·pct/100) rows with the
    * smallest hash keys in each stratum.
    */
  def stratifiedExact(df: DataFrame, idCol: String, stratumCol: String,
                      pct: Int): DataFrame = {
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(stratumCol)
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      // counts is one row per stratum — always broadcast-sized
      .join(broadcast(counts), Seq(stratumCol))
      // `div`, not `/`: Spark's `/` is double division even on BIGINTs
      .filter(col("__rn") <= expr(s"(__n * $pct + 99) div 100"))
      .drop("__rn", "__n")
  }

  /** Query surface: exact 20% per source over documents. */
  def docsStratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedExact(
      Tables.documents(spark, dir).select("doc_id", "source"),
      "doc_id", "source", pct = 20)
      .orderBy("doc_id")

  /** Query surface: mixture recipe over sources — 50% of src0, 25% of
    * src1, 10% of src2 (basis points of 10000), others dropped.
    */
  /** The D12 recipe (basis points of 10000 per source) — ONE shared
    * object: the streaming mixture gate (DocStream) applies the same
    * recipe in-stream, and the stream-equals-batch property depends on
    * both reading these rates.
    */
  val D12Recipe: Map[String, Int] =
    Map("src0" -> 5000, "src1" -> 2500, "src2" -> 1000)

  def docsMixtureSample(spark: SparkSession, dir: String): DataFrame =
    mixtureByHash(
      Tables.documents(spark, dir).select("doc_id", "source"),
      "doc_id", "source", D12Recipe)
      .orderBy("doc_id")

  /** D18: k-center greedy (farthest-point) selection — the DIVERSITY
    * half of data selection (DSIR weights pick for quality, k-center
    * picks for coverage: the classic coreset construction, 2-approx
    * optimal for the k-center objective). Greedy invariant: each pick
    * is the corpus point farthest from every already-selected center,
    * and its distance at selection time — the coverage radius — is
    * non-increasing by construction.
    *
    * Scale shape: the selected-center set is k rows of metadata (the
    * same class as IVF centroids), carried as a BROADCAST-LITERAL
    * matrix into one codegen'd min-distance kernel pass per pick —
    * `centroid_dists` against the growing center matrix, then a
    * TakeOrdered(1) argmax. k corpus scans, zero shuffles beyond the
    * 1-row argmax; each iteration is a FRESH plan over the source
    * (constant depth — no lineage growth across picks). Ties broken
    * by vec_id so the selection is deterministic.
    */
  def kcenterSelect(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import graft.functions.vector.centroid_dists
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // deterministic seed: the smallest vec_id
    val seedRow = emb.orderBy("vec_id").head()
    var centers = Vector((seedRow.getLong(0),
      seedRow.getSeq[Float](1).toArray, Double.PositiveInfinity))
    var exhausted = false
    while (centers.length < k && !exhausted) {
      val mat = centers.map(_._2).toArray
      val next = emb
        .withColumn("d", array_min(centroid_dists(col("embedding"), mat)))
        .orderBy(col("d").desc, col("vec_id"))
        .head()
      // radius 0 means every remaining point coincides with a selected
      // center (k exceeds the number of DISTINCT vectors): stop early
      // rather than emit duplicate centers with zero coverage gain
      if (next.getDouble(2) == 0.0) exhausted = true
      else centers = centers :+ ((next.getLong(0),
        next.getSeq[Float](1).toArray, next.getDouble(2)))
    }
    centers.zipWithIndex.map { case ((id, _, r), i) =>
      (i.toLong, id, if (r.isInfinity) -1.0 else math.rint(r * 1e4) / 1e4)
    }.toDF("pick", "vec_id", "radius")
  }

  /** D16: deterministic corpus shuffle — the global training-order
    * randomization every pretraining run does between mixing and
    * packing (a biased order — by source, by crawl date — measurably
    * hurts convergence; the shuffle must also be REPRODUCIBLE, so
    * "random" means a seeded hash of the stable doc id, never a
    * runtime RNG).
    *
    * Shape at 100 TB: the bucket is the md5 key's FIRST TWO HEX CHARS
    * — 256 hash-range buckets that are uniform by construction (the
    * key is a hash) and, critically, DETERMINISTIC: a sampled
    * `repartitionByRange` would compute split points independently in
    * the two plan branches below (local ranks, bucket counts) unless
    * the physical planner happened to reuse one exchange, and
    * diverging boundaries would silently break the permutation. A
    * prefix of the sort key cannot diverge, and bucket order == key
    * order because the bucket IS the key's leading characters. The
    * GLOBAL position is then the same two-phase prefix sum as D8's
    * packer: per-bucket local ranks (window partitioned by bucket —
    * one bucket, not the corpus, per task) plus a 256-row base-offset
    * frame broadcast back. No global window, no sampling, no driver
    * collect; the oracle replays the identical md5 ordering.
    */
  def corpusShuffle(spark: SparkSession, dir: String, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(s":$seed")).cast("binary")).as("k"))
      .withColumn("bucket", substring(col("k"), 1, 2)) // deterministic prefix range
    val local = docs.withColumn("local_rn",
      row_number().over(Window.partitionBy("bucket").orderBy("k")))
    val bases = docs.groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("base", coalesce(sum("cnt").over(Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))) // ≤ 256 rows
      .select("bucket", "base")
    local.join(broadcast(bases), "bucket")
      .select(col("doc_id"),
        (col("base") + col("local_rn") - 1).cast("bigint").as("shuffle_pos"))
      .orderBy("doc_id")
  }

  /** D15: DSIR-style importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw-pool document by how target-like it is under two
    * unigram language models — per-token log-likelihood ratio
    * log p_target(w) − log p_raw(w), summed over the document's
    * tokens. Resampling the pool by these weights is the modern
    * quality-targeting step between dedup and tokenization; the
    * weights are the operator, thresholding/sampling is policy (the
    * D11/D12 samplers compose downstream).
    *
    * Both LMs use add-1 smoothing over the JOINT vocabulary, so every
    * token has finite mass under both models. Exactness discipline:
    * the per-WORD log ratio is quantized to an INTEGER (micro-nats) in
    * the vocabulary dimension, the per-doc sum runs on BIGINTs (exact
    * under any aggregation order — a float sum here would be
    * order-dependent in the last bits and could round differently in
    * the two engines), and only the final report divides back to a
    * 4-decimal double from identical integers.
    *
    * Shape at 100 TB: one exploded-token aggregation builds BOTH
    * vocab count columns in a single shuffle (map-side combined; the
    * vocabulary, not the corpus, is the aggregate's cardinality — it
    * grows sublinearly by Heaps' law); totals are a 1-row broadcast;
    * the token→ratio attach is an unhinted equi-join on the word
    * (AQE broadcasts the vocab frame while it fits, shuffles past
    * that); the per-doc sum is the second and last corpus shuffle.
    */
  def dsirWeights(spark: SparkSession, dir: String,
                  targetSource: String = "src0"): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .transform(graft.Tables.spread(spark, _))
    val tok = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("w"))
    val vocab = tok.groupBy("w").agg(
      sum(when(col("source") === targetSource, 1L).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= targetSource, 1L).otherwise(0L)).as("cs"))
    // 1-row totals frame: target tokens, raw tokens, joint vocab size
    val totals = vocab.agg(sum("ct").as("nt"), sum("cs").as("ns"),
      count(lit(1)).as("v"))
    val ratio = vocab.join(broadcast(totals))
      .select(col("w"), round(
        (log((col("ct") + 1).cast("double") / (col("nt") + col("v"))) -
          log((col("cs") + 1).cast("double") / (col("ns") + col("v")))) * 1e6,
        0).cast("bigint").as("lr6"))
    tok.filter(col("source") =!= targetSource)
      .join(ratio, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_tokens"),
        round(sum("lr6").cast("double") / 1e6, 4).as("dsir_logratio"))
      .orderBy("doc_id")
  }
}
