package graft.ann

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.vector._

/** IVF (inverted-file) vector index, Spark-batch edition.
  *
  * Reference analogue: pgvector IVFFlat
  * (/root/reference/controller/initialize_main_tables.py:83 `CREATE INDEX
  * ... USING ivfflat`, probes set via `SET ivfflat.probes` in
  * basic_benchmark/common_function.py:83).
  *
  * Spark-first re-expression: the index IS a partitioning.
  *   - build: deterministic k-means (`fitCentroids`) → tiny centroid
  *     matrix (k × dim floats, kilobytes); every vector gets a `list_id`
  *     from the `nearest_centroid` expression inside its scan stage. At
  *     100 TB the assignment is written once as list_id-partitioned
  *     parquet, so a probe scan is partition pruning, not a filter.
  *   - search: nprobe nearest centroids picked driver-side (centroid set
  *     is tiny), then ONLY those lists are scanned — the scan cost drops
  *     by ~nprobe/k, which is the entire point of IVF.
  */
object IvfIndex {

  final case class Index(k: Int, centroids: Array[Array[Float]])

  private val cache = TrieMap.empty[(String, Int), Index]

  /** Deterministic k-means (r13, VERDICT r12 #3): identical data +
    * identical code must yield IDENTICAL centroids on any JVM and any
    * partition layout. MLlib's `setSeed(42)` does not give that — its
    * "random" init samples depend on the physical partition layout, so
    * the same corpus fit different cells across sessions, and on
    * near-isotropic data the blocking selectivity (hence C5's measured
    * cost: 8.2 s vs 38 s at the same 10× data, CALIBRATION r12) swung
    * with the fit. Two choices remove every nondeterminism source:
    *
    *   - init: the k rows with the smallest (xxhash64(vec_id), vec_id)
    *     key — a deterministic pseudo-random sample (same spirit as
    *     the engine's other hash-derived stand-ins for randomness),
    *     picked by a distributed takeOrdered, layout-independent.
    *   - Lloyd steps: assignment is `nearest_centroid` (double math,
    *     ties to the smallest cell id — already deterministic); the
    *     new per-cell means sum QUANTIZED LONGS (round(x·2²⁴), exact
    *     associative+commutative integer addition) instead of doubles,
    *     so the reduction order Spark picks cannot perturb the result.
    *     The 2⁻²⁴ quantization error (~6e-8) is noise four orders
    *     below what a pruning/blocking index can resolve.
    *
    * Cost shape at scale: per iteration one corpus scan + a map-side-
    * combined (cell, dim) aggregation of k·dim long cells — the same
    * linear pass MLlib pays, minus its seed-sampling jobs.
    */
  private[graft] def fitCentroids(df: DataFrame, k: Int,
                                  iters: Int = 5): Array[Array[Float]] = {
    val Scale = (1L << 24).toDouble
    // Repartition + cache across the Lloyd rounds: the fit inherits the
    // SOURCE partitioning, and a corpus stored as one parquet file under
    // maxPartitionBytes (ScaleGen's coalesce(1) dirs) pins every
    // assignment scan to ONE task — at k=800 over 200k vectors that is
    // ~10 GFLOP/round on a single core (measured: the 100× dedup warmup
    // sat 40+ min in this loop). Safe for determinism: seeds come from a
    // total (hash, id) order and Lloyd sums are quantized-long
    // (associative+commutative), so partition count cannot perturb the
    // result — Round13Spec pins layout independence.
    val feats = df.select(col("vec_id"), col("features"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .persist()
    try {
    // seed ORDER is load-bearing (centroid index = cell id): the hash
    // key rides along and the driver re-sorts the collected rows by it
    // — limit() makes no ordering promise after collect
    var centers = feats
      .select(xxhash64(col("vec_id")).as("h"), col("vec_id"), col("features"))
      .orderBy(col("h"), col("vec_id"))
      .limit(k)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Float](2).toArray))
      .sortBy(_._1)
      .map(_._2)
    // named diagnostic (ADVICE r13): limit(k) on a corpus with fewer
    // rows than k returns short — Index(k, centers) would then carry a
    // k its centroid array can't back, and every consumer of Index.k
    // (cell ids, nprobe caps) would trip on the inconsistency far from
    // the cause
    require(centers.length == k,
      s"fitCentroids: corpus has only ${centers.length} rows, need k=$k seeds")
    for (_ <- 1 to iters) {
      val cents = centers
      val sums = feats
        .select(nearest_centroid(col("features"), cents).as("cell"),
          posexplode(col("features")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(sum(round(col("x").cast("double") * Scale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = centers.map(_.clone())
      sums.foreach { r =>
        val (cell, pos) = (r.getInt(0), r.getInt(1))
        next(cell)(pos) = ((r.getLong(2).toDouble / r.getLong(3)) / Scale).toFloat
      }
      // cells that captured no points keep their previous center
      // (cloned above), the standard empty-cell rule — deterministic
      centers = next
    }
    centers
    } finally feats.unpersist(blocking = false)
  }

  /** Fit (or fetch cached) centroids for the corpus — deterministic
    * k-means (see `fitCentroids`; 5 Lloyd iterations is plenty for a
    * pruning index: recall is governed by nprobe, not centroid polish).
    */
  def getOrBuild(spark: SparkSession, dir: String, k: Int): Index =
    cache.getOrElseUpdate((dir, k), {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").as("features"))
      Index(k, fitCentroids(emb, k))
    })

  private val assignCache = new graft.SessionFrameCache[(String, Int)]

  /** (vec_id, list_id): nearest-centroid assignment, computed entirely
    * inside the scan stage (no join, no aggregation, no shuffle).
    */
  def assignments(spark: SparkSession, dir: String, k: Int): DataFrame =
    assignCache.getOrElseUpdate(spark, (dir, k)) {
      val idx = getOrBuild(spark, dir, k)
      // nearest_centroid bakes the (tiny) centroid matrix into the
      // expression: one argmin pass inside the scan stage — no join, no
      // per-vector aggregation, no shuffle at all.
      Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          nearest_centroid(col("embedding"), idx.centroids).as("list_id"))
        .persist() // the assignment IS the index; reused across searches
    }

  private val withCellsCache = new graft.SessionFrameCache[(String, Int)]

  /** Corpus with its cell id attached, persisted — the in-memory mirror
    * of the cell-partitioned parquet the index build writes at scale.
    * The bucketed self-joins (kNN graph) read it on both sides instead
    * of re-scanning + re-assigning per branch.
    */
  def withCells(spark: SparkSession, dir: String, k: Int): DataFrame =
    withCellsCache.getOrElseUpdate(spark, (dir, k)) {
      val idx = getOrBuild(spark, dir, k)
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("cell", nearest_centroid(col("embedding"), idx.centroids))
        .persist()
    }

  private val radiiCache = TrieMap.empty[(String, Int, Boolean), Map[Int, Double]]

  /** Per-cell covering radius max‖v − c‖ — index metadata for lossless
    * triangle-inequality pruning: a cell can hold a vector within
    * distance t of q only if d(q, c) − radius ≤ t. Computed once per
    * index in one scan+agg (k tiny rows), cached like the centroids.
    */
  def cellRadii(spark: SparkSession, dir: String, k: Int,
                unit: Boolean = false): Map[Int, Double] =
    radiiCache.getOrElseUpdate((dir, k, unit), {
      val idx = if (unit) getOrBuildUnit(spark, dir, k) else getOrBuild(spark, dir, k)
      val cents = spark.createDataFrame(
        idx.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c) })
        .toDF("list_id", "centroid")
      val vec = if (unit) vec_normalize(col("embedding")) else col("embedding")
      Tables.embeddings(spark, dir)
        .select(col("vec_id"), vec.as("v"),
          nearest_centroid(vec, idx.centroids).as("list_id"))
        .join(broadcast(cents), "list_id")
        .groupBy("list_id")
        .agg(max(l2_dist(col("v"), col("centroid"))).as("r"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    })

  private val unitCache = TrieMap.empty[(String, Int), Index]

  /** Unit-sphere index: k-means over NORMALIZED vectors — the blocking
    * structure for cosine-threshold joins (cos ≥ τ ⇔ unit-L2 ≤ √(2−2τ)).
    */
  def getOrBuildUnit(spark: SparkSession, dir: String, k: Int): Index =
    unitCache.getOrElseUpdate((dir, k), {
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), vec_normalize(col("embedding")).as("features"))
      Index(k, fitCentroids(emb, k))
    })

  /** B3: index-build report — list sizes (the reference's `CREATE INDEX`
    * observable). Rows-only: k-means is engine-specific.
    */
  def buildReport(spark: SparkSession, dir: String, k: Int = 16): DataFrame =
    assignments(spark, dir, k)
      .groupBy("list_id")
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy("list_id")

  private val sidecarWritten = new graft.SessionCache[(String, Int), Boolean]

  /** Oracle sidecar: the fitted centroid table (list_id, centroid),
    * written once per session to a fixed path so the DuckDB oracle can
    * REPLAY the nearest-centroid assignment independently (same
    * double-precision subtract-square-accumulate in index order, ties
    * to the smallest list id). The path carries only k: the driver
    * runs Verify for one sf dir and the oracle immediately after, so
    * the sidecar on disk always belongs to the run being checked.
    */
  def writeCentroidSidecar(spark: SparkSession, dir: String, k: Int): Unit =
    if (graft.Sidecars.active) sidecarWritten.getOrElseUpdate(spark, (dir, k)) {
      import spark.implicits._
      val out = graft.Sidecars.path(s"ivf_centroids_k$k.parquet")
      getOrBuild(spark, dir, k).centroids.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toSeq) }
        .toDF("list_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(out)
      true
    }

  /** Unit-sphere variant of `writeCentroidSidecar` (C10's quantizer). */
  def writeUnitCentroidSidecar(spark: SparkSession, dir: String, k: Int): Unit =
    if (graft.Sidecars.active) sidecarWritten.getOrElseUpdate(spark, (dir + "#unit", k)) {
      import spark.implicits._
      val out = graft.Sidecars.path(s"ivf_unit_centroids_k$k.parquet")
      getOrBuildUnit(spark, dir, k).centroids.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toSeq) }
        .toDF("list_id", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(out)
      true
    }

  /** nprobe nearest list ids for a query vector — computed driver-side
    * over the (tiny) centroid set, exactly like pgvector's probe pick.
    *
    * ASSUMPTION (shared by `cellRadii`'s driver map): a coarse
    * quantizer keeps cells ≈ √N, so the centroid matrix is index
    * METADATA — even 10⁵ cells × 64 dims × 4 B is ~25 MB, comfortably
    * driver-sized, and the argmin costs cells·dim flops per query.
    * Past ~10⁵ cells use `probeListsDistributed`, which picks the same
    * probe set as a distributed top-nprobe over a centroid table (at
    * that scale the centroids live in a parquet sidecar anyway).
    */
  def probeLists(idx: Index, q: Array[Float], nprobe: Int): Seq[Int] = {
    // Double subtraction, matching l2_dist/NearestCentroid exactly —
    // a Float subtraction here could order near-tied centroids
    // differently than probeListsDistributed
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }
    idx.centroids.zipWithIndex
      .map { case (c, i) => (d2(c, q), i) }
      .sortBy(identity).take(nprobe).map(_._2).toSeq
  }

  /** The huge-quantizer path: same probe pick as `probeLists`, but as a
    * distributed top-nprobe over a centroid FRAME (at 10⁶+ cells the
    * centroid set is itself a table, not a driver array). nprobe ids
    * come back to the driver — that part is always tiny.
    */
  def probeListsDistributed(spark: SparkSession, idx: Index, q: Array[Float],
                            nprobe: Int): Seq[Int] = {
    val cents = spark.createDataFrame(
      idx.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c) })
      .toDF("list_id", "centroid")
    cents
      .withColumn("d", l2_dist(col("centroid"), typedLit(q)))
      .orderBy(col("d"), col("list_id"))
      .limit(nprobe)
      .collect().map(_.getInt(0)).toSeq
  }

  private def queryVec(spark: SparkSession, dir: String, qid: Long): Array[Float] =
    Tables.embeddings(spark, dir).filter(col("vec_id") === qid)
      .select("embedding").head().getSeq[Float](0).toArray

  /** B4: IVF probe search — scan only the nprobe lists, exact re-rank
    * inside them. Approximate overall (recall checked in ScalaTest).
    *
    * Plan shape: the probe predicate is a FILTER on the cell-attached
    * corpus (`withCells`, the in-memory mirror of the cell-partitioned
    * parquet the index build writes at scale) — the corpus is never
    * joined, shuffled, or broadcast. At 100 TB the same filter is a
    * partition predicate on the `cell=` directories, so the scan reads
    * ~nprobe/k of the bytes (pgvector `SET ivfflat.probes` semantics,
    * common_function.py:83). Asserted Exchange-free in ProbePlanSpec.
    */
  def search(spark: SparkSession, dir: String, k: Int = 16, nprobe: Int = 4,
             topk: Int = 10, qid: Long = 0): DataFrame = {
    val idx = getOrBuild(spark, dir, k)
    val lists = probeLists(idx, queryVec(spark, dir, qid), nprobe)
    withCells(spark, dir, k)
      .filter(col("cell").isin(lists: _*)) // partition pruning at scale
      .filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(
        Tables.embeddings(spark, dir).filter(col("vec_id") === qid)
          .select(col("embedding").as("qvec"))))
      .withColumn("dist", l2_dist(col("embedding"), col("qvec")))
      .orderBy(col("dist"), col("vec_id"))
      .limit(topk)
      .select(col("vec_id"), col("cell").as("list_id"))
  }

  /** B12: predicate-aware probe search — the ACORN/dynamic-partition
    * insight (controller/dynamic_partition/acorn): under a selective
    * permission filter a fixed nprobe may hold < k accessible
    * candidates, so widen the probe set until the filtered candidate
    * pool can satisfy k.
    *
    * One-pass escalation: a SINGLE aggregation job computes the
    * accessible-candidate count per list (k tiny rows to the driver);
    * the probe prefix is then chosen from those counters — no re-scan
    * loop. At 100 TB the per-list counters live next to the index
    * metadata and this stays one cheap job + one search job.
    */
  def predicateAwareSearch(spark: SparkSession, dir: String, userId: Long,
                           k: Int = 16, nprobe: Int = 2, topk: Int = 10): DataFrame = {
    val idx = getOrBuild(spark, dir, k)
    val q = queryVec(spark, dir, 0)
    val acc = graft.rbac.Rbac.accessibleDocs(spark, dir, userId)
    val assigned = assignments(spark, dir, k)

    // one aggregation: accessible candidates per list (≤ k rows)
    val accPerList = assigned
      .join(broadcast(acc.withColumnRenamed("document_id", "acc_doc")),
        col("vec_id") === col("acc_doc"), "left_semi")
      .groupBy("list_id").agg(count(lit(1)).as("n_acc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // widen in centroid-distance order until the accessible pool can
    // fill top-k (driver-side arithmetic over k counters)
    val ordered = probeLists(idx, q, k)
    var probes = nprobe
    while (probes < k &&
      ordered.take(probes).map(accPerList.getOrElse(_, 0L)).sum < topk) probes += 1
    val lists = ordered.take(probes)

    // search job: probe predicate = filter on the cell-attached corpus
    // (partition pruning at scale), permission = explicit broadcast
    // semi-join — the corpus side has no Exchange (ProbePlanSpec)
    withCells(spark, dir, k)
      .filter(col("cell").isin(lists: _*))
      .join(broadcast(acc.withColumnRenamed("document_id", "acc_doc")),
        col("vec_id") === col("acc_doc"), "left_semi")
      .crossJoin(broadcast(
        Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec"))))
      .withColumn("dist", l2_dist(col("embedding"), col("qvec")))
      .orderBy(col("dist"), col("vec_id"))
      .limit(topk)
      .select(col("vec_id"), col("cell").as("list_id"))
  }

  /** B12 model-driven variant: the STARTING probe depth comes from the
    * fitted nprobe→recall curve (RecallModel — the reference's
    * get_parameter loop) for a recall target instead of a constant;
    * the accessible-count escalation still applies on top (the
    * permission filter can only LOWER the accessible pool, never the
    * vector-side recall the model predicts).
    */
  def predicateAwareSearchModel(spark: SparkSession, dir: String, userId: Long,
                                targetRecall: Double = 0.9, k: Int = 16,
                                topk: Int = 10): DataFrame =
    predicateAwareSearch(spark, dir, userId, k,
      RecallModel.measure(spark, dir, k, topk).nprobeFor(targetRecall), topk)

  /** B14: triangle-inequality-pruned EXACT range search. With per-vector
    * centroid distances precomputed in the index (d(v,c)) and the
    * query-to-centroid distances known (d(q,c), tiny), the reverse
    * triangle inequality d(q,v) ≥ |d(q,c) − d(v,c)| rejects most rows
    * with ONE scalar comparison before any 64-dim distance math — a
    * lossless filter, so the result (and the oracle) is identical to
    * brute-force range search. The 1e-9 slack keeps float noise at the
    * boundary from over-pruning.
    */
  def rangeSearchTriangle(spark: SparkSession, dir: String, tau: Double,
                          k: Int = 16, qid: Long = 0): DataFrame = {
    val idx = getOrBuild(spark, dir, k)
    val q = queryVec(spark, dir, qid)
    def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    val dqc = spark.createDataFrame(
      idx.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, dist(c, q)) })
      .toDF("list_id", "dqc")
    val cents = spark.createDataFrame(
      idx.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c) })
      .toDF("list_id", "centroid")
    Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .filter(col("vec_id") =!= qid)
      .withColumn("list_id", nearest_centroid(col("embedding"), idx.centroids))
      .join(broadcast(cents), "list_id")
      .join(broadcast(dqc), "list_id")
      .withColumn("dvc", l2_dist(col("embedding"), col("centroid")))
      .filter(abs(col("dqc") - col("dvc")) <= tau + 1e-9) // lossless prune
      .crossJoin(broadcast(
        Tables.embeddings(spark, dir).filter(col("vec_id") === qid)
          .select(col("embedding").as("qvec"))))
      .filter(l2_dist(col("embedding"), col("qvec")) < tau)
      .select("vec_id")
      .orderBy("vec_id")
  }

  /** B9: qd-tree layout (HQI baseline, qd_tree.py:508): leaf =
    * (k-means cell × granting-role-set signature) — vector locality AND
    * permission locality in one partitioning key. The signature is the
    * doc's FULL granting role set (`combKeys`), i.e. the fully-split
    * flat form of the role-predicate splits `find_best_split`
    * (qd_tree.py:420) applies recursively — which is what makes routing
    * over these leaves lossless (see qdTreeSearch). Output: per-leaf
    * block counts.
    */
  def qdTreeAssign(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val assigned = assignments(spark, dir, k)
    val sigs = graft.rbac.Partitioned.combKeys(spark, dir)
    assigned
      .join(sigs, assigned("vec_id") === sigs("document_id"))
      .groupBy("list_id", "comb_key")
      .agg(count(lit(1)).as("n_blocks"))
      .orderBy("list_id", "comb_key")
  }

  /** B10: qd-tree routed search (qd_tree.py:644
    * find_relevant_partitions): route to exactly the leaves whose
    * role-set signature INTERSECTS the user's roles. A doc is
    * accessible iff its granting set intersects the user's roles, so
    * signature routing is LOSSLESS — the routed scan holds exactly the
    * accessible blocks and the result equals the prefilter answer
    * (shared DuckDB oracle). `nprobe > 0` additionally prunes the
    * vector dimension of the leaf key (the recall/latency knob the
    * qd-tree layout offers at scale — asserted ≥ recall floor in
    * ScalaTest); 0 scans all routed cells = exact.
    */
  def qdTreeSearch(spark: SparkSession, dir: String, userId: Long, k: Int = 8,
                   nprobe: Int = 0, topk: Int = 10): DataFrame = {
    val ur = graft.rbac.Rbac.userRoles(spark, dir)
      .filter(col("user_id") === userId).select("role_id")
    // leaf signatures intersecting the user's roles (tiny: ≤ #combs)
    val routedSigs = graft.rbac.Rbac.permissions(spark, dir)
      .join(graft.rbac.Partitioned.combKeys(spark, dir), "document_id")
      .select("comb_key", "role_id").distinct()
      .join(broadcast(ur), "role_id")
      .select("comb_key").distinct()
    val base = graft.rbac.Rbac.blocks(spark, dir)
      .join(graft.rbac.Partitioned.combKeys(spark, dir), "document_id")
      .join(broadcast(routedSigs), Seq("comb_key"), "left_semi") // leaf routing
    val routed = if (nprobe > 0) {
      // vector-side leaf pruning: cell computed inside the scan (no join
      // against the assignment — a corpus-sized semi-join at scale); at
      // 100 TB the leaf key (cell, comb_key) is the partition directory
      // and both predicates are partition pruning
      val idx = getOrBuild(spark, dir, k)
      val lists = probeLists(idx, queryVec(spark, dir, 0), nprobe)
      base.withColumn("cell", nearest_centroid(col("embedding"), idx.centroids))
        .filter(col("cell").isin(lists: _*)).drop("cell")
    } else base
    routed
      .crossJoin(broadcast(
        Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec"))))
      .withColumn("dist", l2_dist(col("embedding"), col("qvec")))
      .orderBy(col("dist"), col("block_id"))
      .limit(topk)
      .select("block_id", "document_id")
  }
}
