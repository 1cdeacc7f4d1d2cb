package graft.ann

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.{PlanCut, Tables}
import graft.functions.vector._
import graft.operators.TopKAgg.{topk_ids, topk_kth, topk_kth_distinct}

/** ANN / vector-search operators over `embeddings` (SURVEY.md §2.B).
  *
  * Reference analogue: pgvector scans in
  * /root/reference/basic_benchmark/common_function.py (ORDER BY
  * vector <-> q LIMIT k) and the brute-force ground truth in
  * basic_benchmark/compute_ground_truth.py.
  *
  * Scale design: the corpus side is only ever scanned (never shuffled);
  * query vectors are broadcast; single-query top-k is a
  * TakeOrderedAndProject (per-partition heap, k rows per partition) and
  * multi-query top-k is the TopKByScore partial aggregate.
  */
object Ann {

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select("vec_id", "embedding")

  private def queryVec(spark: SparkSession, dir: String, qid: Long): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") === qid)
      .select(col("embedding").as("qvec"))

  /** Exact cosine top-k for one query (vec_id 0), excluding the query
    * row itself. */
  def bruteForceCosineTopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(spark, dir, 0)))
      .withColumn("sim", cosine_sim(col("embedding"), col("qvec")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
      .select("vec_id")

  /** Exact L2 top-k for one query (pgvector `<->` ground truth). */
  def bruteForceL2TopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(spark, dir, 0)))
      .withColumn("dist", l2_dist(col("embedding"), col("qvec")))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .select("vec_id")

  /** Exact L1 (Manhattan) top-k — pgvector `<+>` (vector.c:729);
    * completes the dense distance family.
    */
  def bruteForceL1TopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(spark, dir, 0)))
      .withColumn("dist", l1_dist(col("embedding"), col("qvec")))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .select("vec_id")

  /** Batch exact top-k: `nq` query vectors × corpus, one partial-agg
    * pass (compute_ground_truth.py computes this per user with FAISS;
    * here it is a single distributed plan: corpus scanned once, queries
    * broadcast, shuffle = nq × k ids).
    */
  def batchTopK(spark: SparkSession, dir: String, nq: Int, k: Int): DataFrame = {
    val queries = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    corpus(spark, dir)
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id")
      .agg(topk_ids(l2_dist(col("embedding"), col("qvec")), col("vec_id"), k).as("ids"))
      .select(col("query_id"), explode(col("ids")).as("block_id"))
      .orderBy("query_id", "block_id")
  }

  /** Max-inner-product top-k — pgvector's `<#>` operator class (its
    * negation is ordered ascending; equivalently max dot product).
    */
  def maxInnerProductTopK(spark: SparkSession, dir: String, k: Int): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(spark, dir, 0)))
      .withColumn("ip", dot(col("embedding"), col("qvec")))
      .orderBy(col("ip").desc, col("vec_id"))
      .limit(k)
      .select("vec_id")

  /** B11: EXACT k-NN graph over the corpus, cell-bucketed — the batch
    * primitive graph-ANN indexes (HNSW/NSG — the reference's other
    * index family) bootstrap from; on Spark the graph build IS the
    * index build.
    *
    * Two-phase, never broadcasting (or crossJoining) the corpus, and
    * with a LINEAR kernel budget in phase 1 (r10 — the r9 scale run
    * measured the previous same-cell-all-pairs bound phase at N²/cells
    * kernels, the one superlinear term of the build):
    *   1. ring bound: within each cell, each src takes its ±k ring
    *      neighbors as candidates via an equi-join on (cell, ring
    *      slot), under TWO 1-D projections (distance to own centroid,
    *      distance to the cell's nearest other centroid — one
    *      projection interleaves clusters at similar radii and goes
    *      inter-cluster loose) — ≤4k kernel evaluations per src,
    *      O(k·N) total — and the least of the two rings' kth candidate
    *      distances is a valid kth-NN UPPER BOUND (any k candidates
    *      upper-bound the true kth; `topk_kth` returns +∞ when a ring
    *      holds < k rows, degrading losslessly);
    *   2. lossless cell pruning + per-pair pivot filter: cell c can
    *      hold a true neighbor of src only if d(src, centroid_c) −
    *      radius_c ≤ bound, so src is replicated only into surviving
    *      cells and joined by cell id; each joined pair then passes
    *      the multi-pivot triangle filter max_i |d(src,cᵢ) − d(dst,cᵢ)|
    *      ≤ bound (`linf_dist_d` over the `centroid_dists` arrays both
    *      sides already carry — LAESA-style) BEFORE the 64-dim kernel:
    *      a true neighbor has d(src,dst) ≤ kth ≤ bound and every pivot
    *      gap lower-bounds d(src,dst), so no true neighbor is filtered
    *      and the surviving candidates are re-ranked exactly.
    * Every join is a shuffle equi-join on cell id or (cell, slot) (at
    * 100 TB the member side is cell-partitioned parquet written by the
    * index build, so only the pruned src fan-out moves); the result is
    * exactly the brute-force graph — the oracle stays the quadratic SQL.
    */
  def knnGraph(spark: SparkSession, dir: String, k: Int, cells: Int = 16): DataFrame =
    knnEdges(spark, dir, k, cells).orderBy("src", "nbr")

  /** Corpus-size ceiling for the EXACT kNN-graph build in the auto
    * dispatch. Measured (CALIBRATION r10/r11): at N = 2000 (sf0.1) the
    * exact build's candidate stream is within its linear budget; at
    * N = 20 000 (ScaleGen 10×, isotropic) the joined stream grew
    * 16.1× for 10× data — the documented quadratic regime where cell
    * pruning stops being selective. 5000 sits in the measured-safe
    * decade with headroom.
    */
  val KnnExactMaxN = 5000L

  /** B11/B17 dispatch (r12, closes VERDICT r11 #7): one kNN-graph
    * operator, exact below the measured corpus threshold, NN-Descent
    * above. Same (src, nbr) edge-list schema both sides. At every
    * oracle SF (N ≤ 2000) the dispatch is the exact branch, so the
    * key carries B11's quadratic SQL oracle unchanged; past the
    * threshold the caller gets the graph the 100× run proved buildable
    * (linear init, measured flat serving) instead of the one that
    * isn't. The descent branch uses the canonical serving parameters
    * (iters = 2, derived cells).
    */
  def knnGraphAuto(spark: SparkSession, dir: String, k: Int = 5,
                   maxExactN: Long = KnnExactMaxN): DataFrame = {
    val n = corpusCount.getOrElseUpdate(spark, dir)(
      graft.Tables.embeddings(spark, dir).count())
    if (n <= maxExactN) knnGraph(spark, dir, k)
    else knnGraphDescent(spark, dir, k)
  }

  /** B11 restricted to the base prefix `vec_id < maxId` — the graph an
    * incremental insert batch (B33) walks. The IVF scaffolding (fit +
    * radii) stays full-corpus: a full-cell radius upper-bounds the
    * subset's, so the triangle pruning remains lossless, just slightly
    * less tight.
    */
  def knnGraphOn(spark: SparkSession, dir: String, k: Int, cells: Int,
                 maxId: Long): DataFrame =
    knnEdges(spark, dir, k, cells, Some(maxId)).orderBy("src", "nbr")

  /** B11's edge set WITHOUT the query-surface total-order sort —
    * consumers that repartition anyway (GraphX centrality, the
    * serving-graph symmetrize+cap build) skip one full range-exchange
    * over the k·N edges.
    */
  private[ann] def knnEdges(spark: SparkSession, dir: String, k: Int, cells: Int,
                            maxId: Option[Long] = None): DataFrame = {
    val all = IvfIndex.withCells(spark, dir, cells)
    knnEdgesFrom(spark, dir, k, cells, maxId.fold(all)(m => all.filter(col("vec_id") < m)))
  }

  /** B11's exact build over an ARBITRARY member subset `e` of the
    * cell-attached corpus (any restriction of `IvfIndex.withCells`) —
    * the per-dynamic-partition graph build (A21) routes through this.
    * The IVF scaffolding (fit + radii) stays full-corpus: a full-cell
    * radius upper-bounds any subset's, so pruning stays lossless.
    */
  private[ann] def knnEdgesFrom(spark: SparkSession, dir: String, k: Int, cells: Int,
                                e: DataFrame): DataFrame = {
    val idx = IvfIndex.getOrBuild(spark, dir, cells)
    val radiiDf = broadcast(spark.createDataFrame(
      IvfIndex.cellRadii(spark, dir, cells).toSeq).toDF("cell", "radius"))
    val m = memberFrame(e, idx.centroids)
    val bound = ringUpperBound(spark, m, idx.centroids, k)
    // LEFT join + ∞ default: a src alone in its cell produces no bound
    // group (the ring join has no src≠dst pair), and an inner join here
    // would silently drop it from the graph — with no bound it must keep
    // every cell as a candidate
    val srcCells = m.select(col("vec_id").as("src"), col("embedding").as("ea"), col("z").as("za"))
      .join(bound, Seq("src"), "left")
      .withColumn("ub", coalesce(col("ub"), lit(Double.PositiveInfinity)))
      .select(col("src"), col("ea"), col("za"), col("ub"), posexplode(col("za")))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "dqc")
      .join(radiiDf, "cell")
      .filter(col("dqc") - col("radius") <= col("ub") + lit(1e-9)) // lossless
      .select(col("src"), col("ea"), col("za"), col("ub"), col("cell"))
    // phase 2: pivot triangle filter first (16 double ops), kernel +
    // heap only on survivors — lossless, see Scaladoc
    srcCells.join(
        m.select(col("vec_id").as("dst"), col("embedding").as("eb"),
          col("z").as("zb"), col("cell")), "cell")
      .filter(col("src") =!= col("dst"))
      .filter(linf_dist_d(col("za"), col("zb")) <= col("ub") + lit(1e-9))
      .groupBy("src")
      .agg(topk_ids(l2_dist(col("ea"), col("eb")), col("dst"), k).as("ids"))
      .select(col("src"), explode(col("ids")).as("nbr"))
  }

  /** Member frame of the exact build: pivot distance arrays (d to
    * every centroid) attached ONCE per member row, below the shuffles —
    * the ring orderings and the phase-2 pivot filter all read them.
    */
  private def memberFrame(e: DataFrame, centroids: Array[Array[Float]]): DataFrame =
    e.select(col("vec_id"), col("embedding"), col("cell"))
      .withColumn("z", centroid_dists(col("embedding"), centroids))

  /** Phase 1 of the exact build: per-src kth-NN distance UPPER BOUND
    * from ring candidates — each src meets its ±k ring neighbors in a
    * per-cell 1-D projection order via an equi-join on (cell, slot),
    * O(k·N) candidate rows by construction, no within-cell all-pairs
    * stream. ONE projection interleaves clusters that sit at similar
    * radii from the cell centroid (measured on the clustered
    * Round10Spec corpus: single-ring ubs there are inter-cluster
    * loose), so the bound is the LEAST of two rings over DIFFERENT
    * projections — distance to the own centroid and distance to the
    * cell's nearest other centroid; each ring's kth distance is
    * independently a valid upper bound (any k candidates upper-bound
    * the true kth; `topk_kth` returns +∞ under k rows), so their min
    * is too. Returns (src, ub).
    */
  private def ringUpperBound(spark: SparkSession, m: DataFrame,
                             centroids: Array[Array[Float]], k: Int): DataFrame = {
    // r16 (guide §2.4): the r10 formulation materialized each ring as a
    // row_number window + a (cell, slot) SELF-JOIN, twice, then merged
    // the two kth bounds with a full-outer join — 4 window sorts of the
    // member frame, 2 joins, 2 aggregates, 1 merge join (~6 Exchanges).
    // lead/lag over the SAME cell partitioning reads the ±k ring
    // neighbors straight out of the window frame: one Exchange, two
    // in-partition sorts (one per projection), zero joins, and the
    // kernel is evaluated inside the window projection, so the pair
    // volume (4k·N) is unchanged. Both rings' (dist, dst) candidates
    // are aggregated TOGETHER with a distinct-by-id kth: the union's
    // kth over distinct candidates is ≤ least(ub1, ub2), so the bound
    // only TIGHTENS — phase 2 prunes no less, and the final graph is
    // identical (any k distinct candidates upper-bound the true kth;
    // topk_kth_distinct returns +∞ below k distinct ids, degrading
    // losslessly like the r10 per-ring bound did).
    def ringPairs(proj: Column): Seq[Column] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy(proj, col("vec_id"))
      (1 to k).flatMap { j => Seq(
        struct(l2_dist(col("embedding"), lag(col("embedding"), j).over(w)).as("d"),
          lag(col("vec_id"), j).over(w).as("i")),
        struct(l2_dist(col("embedding"), lead(col("embedding"), j).over(w)).as("d"),
          lead(col("vec_id"), j).over(w).as("i"))) }
    }
    val ring1 = ringPairs(element_at(col("z"), col("cell") + 1))
    val cands = if (centroids.length < 2) ring1 else {
      // per-cell second pivot: the nearest OTHER centroid (driver-side
      // over the tiny centroid matrix)
      def cdist(a: Array[Float], bb: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - bb(i).toDouble; s += d * d; i += 1 }
        s
      }
      val p2 = centroids.indices.map { c =>
        (c, centroids.indices.filter(_ != c)
          .minBy(o => cdist(centroids(c), centroids(o))))
      }
      ring1 ++ ringPairs(element_at(col("z"),
        element_at(map_from_arrays(
          lit(p2.map(_._1).toArray), lit(p2.map(_._2).toArray)), col("cell")) + 1))
    }
    // two selects: the window expressions must be planned (as Window
    // operators) before the generator can reference their output
    m.select(col("vec_id").as("src"), array(cands: _*).as("cands"))
      .select(col("src"), explode(col("cands")).as("c"))
      .filter(col("c").getField("i").isNotNull)
      .groupBy("src")
      .agg(topk_kth_distinct(
        col("c").getField("d"), col("c").getField("i"), k).as("ub"))
  }

  /** Distance-pair volume of the exact build's phases — ScaleStats
    * instrumentation for the r10 scale run (the counting jobs are
    * measurement-only; production builds never run them):
    * (ring bound pairs, cell-joined pre-filter pairs, post-pivot-filter
    * kernel pairs). Ring pairs are ≤2k·N by construction (the measured
    * linearity of phase 1); the kernel count is what the "subquadratic
    * exact build" claim is about — its growth exponent under a corpus
    * scale-up is the measured fact CALIBRATION.md tables, with the
    * joined count showing how much of the residual quadratic row
    * stream the pivot filter absorbs before the kernel.
    */
  private[graft] def knnCandidateCounts(spark: SparkSession, dir: String,
                                        k: Int, cells: Int): (Long, Long, Long) = {
    val idx = IvfIndex.getOrBuild(spark, dir, cells)
    val e = IvfIndex.withCells(spark, dir, cells)
    val radiiDf = broadcast(spark.createDataFrame(
      IvfIndex.cellRadii(spark, dir, cells).toSeq).toDF("cell", "radius"))
    val m = memberFrame(e, idx.centroids)
    // ring-join cardinality depends only on cell sizes and k (any
    // projection is a within-cell permutation), so one ring's count ×
    // the ring count is exact
    val rings = if (idx.centroids.length < 2) 1 else 2
    val rn = m.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy(element_at(col("z"), col("cell") + 1), col("vec_id"))))
    val ringPairs = rings * rn
      .select(col("vec_id").as("src"), col("cell"),
        explode(sequence(col("rn") - k, col("rn") + k)).as("rn"))
      .join(rn.select(col("vec_id").as("dst"), col("cell"), col("rn")), Seq("cell", "rn"))
      .filter(col("src") =!= col("dst")).count()
    // phases 2a/2b replay the production build's own bound
    val bound = ringUpperBound(spark, m, idx.centroids, k)
    val srcCells = m.select(col("vec_id").as("src"), col("z").as("za"))
      .join(bound, Seq("src"), "left")
      .withColumn("ub", coalesce(col("ub"), lit(Double.PositiveInfinity)))
      .select(col("src"), col("za"), col("ub"), posexplode(col("za")))
      .withColumnRenamed("pos", "cell").withColumnRenamed("col", "dqc")
      .join(radiiDf, "cell")
      .filter(col("dqc") - col("radius") <= col("ub") + lit(1e-9))
      .select(col("src"), col("za"), col("ub"), col("cell"))
    val joined = srcCells.join(
        m.select(col("vec_id").as("dst"), col("z").as("zb"), col("cell")), "cell")
      .filter(col("src") =!= col("dst"))
    val joinedPairs = joined.count()
    val kernelPairs = joined
      .filter(linf_dist_d(col("za"), col("zb")) <= col("ub") + lit(1e-9)).count()
    (ringPairs, joinedPairs, kernelPairs)
  }

  /** B27 `ann_knn_centrality`: PageRank over the exact kNN graph —
    * graph-based data selection (a vector central in the similarity
    * graph represents a dense semantic region; isolated low-rank
    * points are outliers/noise — the coverage counterpart to D18's
    * k-center and D15's quality weights). GraphX staticPageRank
    * (Pregel) over B11's edges: r₀=1, rₜ₊₁ = 0.15 + 0.85·Σ rₜ(u)/deg⁺(u),
    * fixed iteration count — at scale each round is one
    * aggregateMessages pass over |E| = k·N slim edges. Every vertex
    * has out-degree k, so there are no dangling corrections.
    * Oracle-checked (r9): the recurrence is deterministic double
    * arithmetic over a deterministic edge set, so DuckDB replays all
    * `iters` rounds as unrolled CTEs. Ranks round DIRECTLY to 4dp —
    * coarse enough that cross-engine summation-order noise (~1e-13)
    * cannot flip a digit; rounding to 6dp first and re-rounding would
    * double-round values near a .00005 boundary (observed: 1.2165495 →
    * 1.216550 → 1.2166 vs the direct 1.2165).
    */
  /** B41 `ann_knn_centrality_nnd`: PageRank over the NN-DESCENT graph —
    * the at-scale form of B27. The r10 scale run measured the exact
    * build's joined candidate stream quadratic on the isotropic corpus
    * (CALIBRATION round-10), so at 100 TB the centrality signal runs
    * over the NND graph instead: O(iters·k·N) build (measured 1.76×
    * candidate growth at 10× data), identical PageRank recurrence and
    * rounding. Fully oracle-checked since r11: the descent edge set
    * persists as the `nnd_graph_k5` sidecar (only the xxhash64 init
    * is non-SQL) and the DuckDB oracle replays the 10-round
    * recurrence as unrolled CTEs with 1/out-degree weights
    * (SparkEntry oracle). Round10Spec additionally driver-replays the
    * recurrence and asserts 4dp equality.
    */
  /** Scale-adaptive partition count for the GraphX edge RDDs (guide
    * §2.2: partitions sized from the DATA, not inherited from
    * spark.sql.shuffle.partitions). The edge lists arrive from DF
    * plans whose final stage carries the session's shuffle partition
    * count; Pregel then runs `iters` sequential rounds of multi-stage
    * jobs over them, so at the oracle SFs each 10-round PageRank paid
    * ~300 near-empty task launches for k·N ≈ 10⁴ slim rows (measured:
    * 2/3 of ann_knn_centrality_nnd's serial time was Pregel overhead,
    * not compute). ~64k edge rows (~1 MB of (long,long)) per partition
    * keeps tasks milliseconds-cheap; the count GROWS linearly with the
    * corpus (no local-mode constant), capped at 8× the scheduler's
    * parallelism so a 10¹²-edge run fans out with the cluster rather
    * than by partition count alone.
    */
  def graphEdgeParts(spark: SparkSession, nEdges: Long): Int = {
    val byRows = math.max(1L, nEdges / 65536L)
    math.min(byRows, 8L * spark.sparkContext.defaultParallelism).toInt
  }

  /** Static PageRank as ONE lazy DataFrame chain (r17) — replaces the
    * GraphX `staticPageRank` the two centrality keys ran. GraphX's
    * Pregel materializes every iteration (caching, per-round jobs —
    * the event-log profile measured ~73 driver job round-trips for one
    * 10-iteration run, 2/3 of the key's cost at the oracle SFs, r16's
    * edge-partition fix notwithstanding); this form chains the 10
    * rounds lazily and executes them as ONE job whose per-round edge
    * exchange is plan-identical across rounds (ReusedExchange). The
    * recurrence is EXACTLY the oracle's unrolled CTEs (SparkEntry
    * `ann_knn_centrality*`): r0 = 1.0 over every corpus vec_id,
    * rᵗ = 0.15 + 0.85·Σ_in(pr·(1.0/outdeg)) with a left join keeping
    * message-less vertices — the same form GraphX computes (init 1.0,
    * resetProb 0.15, contribution rank/outDegree); the oracle hash
    * pins equality at 4dp, and every corpus vertex appears in both
    * edge sets (out-degree k by construction), so the GraphX
    * endpoint-vertex set and the oracle's corpus vertex set coincide.
    */
  private def pageRankDf(spark: SparkSession, dir: String, edges: DataFrame,
                         iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val g = edges.join(deg, "src") // (src, nbr, deg); subtree reused per round
    val vertices = graft.Tables.embeddings(spark, dir).select(col("vec_id"))
    var rank = vertices.withColumn("pr", lit(1.0))
    for (_ <- 1 to iters) {
      val msgs = g
        .join(rank.withColumnRenamed("vec_id", "src"), "src")
        .groupBy(col("nbr").as("vec_id"))
        .agg(sum(col("pr") * (lit(1.0) / col("deg"))).as("s"))
      rank = vertices.join(msgs, Seq("vec_id"), "left")
        .select(col("vec_id"),
          (lit(0.15) + lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
    }
    rank
      .select(col("vec_id"), round(col("pr"), 4).as("pagerank"))
      .orderBy("vec_id")
  }

  def knnCentralityNnd(spark: SparkSession, dir: String, k: Int = 5,
                       iters: Int = 10, cells: Int = 0): DataFrame =
    pageRankDf(spark, dir,
      knnGraphDescent(spark, dir, k, cells = cells).select("src", "nbr"), iters)

  def knnCentrality(spark: SparkSession, dir: String, k: Int = 5,
                    iters: Int = 10, cells: Int = 16): DataFrame =
    pageRankDf(spark, dir, knnEdges(spark, dir, k, cells).select("src", "nbr"), iters)

  /** B17: NN-Descent approximate k-NN graph — the regime where the
    * exact build (B11) is too expensive: very large k·N. Standard
    * local-join iteration (Dong et al., WWW'11): a node's candidates
    * are the pairs sharing a neighborhood (neighbors + reverse
    * neighbors, capped at 2k for bounded fan-out), re-ranked with the
    * bounded-heap aggregate; candidates always include the current
    * edges, so per-src recall is monotone non-decreasing per round.
    * Initialized from the ±bigK within-cell ring (O(bigK·N) — see
    * buildDescent) plus hash-derived long-range links. Fixed iteration count
    * keeps it deterministic; at scale each round is two vec_id equi-
    * joins + one aggregate over |E| ≈ k·N slim rows (checkpoint the
    * graph between rounds to cut lineage).
    */
  private val descentCache = new graft.SessionFrameCache[(String, Int, Int, Int, Int)]

  /** Candidate-row count of the last sampled round per descent run —
    * recorded only when `collectStats` (the counting job is pure test
    * instrumentation; production runs skip it).
    */
  val descentCandStats =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int, Int, Int), Long]

  /** Init-candidate row count per descent run (ring ∪ long-range,
    * deduplicated) — recorded only under `collectStats`, like
    * `descentCandStats`. The r10 scale table counted only descent
    * ROUNDS, leaving the init term invisible; this makes the init's
    * O(bigK·N) linearity a measured number (ScaleStats
    * `nnd_init_pairs`).
    */
  val descentInitStats =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int, Int, Int), Long]

  private val nndSidecarWritten = new graft.SessionCache[(String, Int), Boolean]

  private val corpusCount = new graft.SessionCache[String, Long]

  /** Descent partition count ∝ corpus (r12, VERDICT r11 #4): the fixed
    * cells=16 left a N/16-row single-task `row_number` window in the
    * at-scale build path — not quadratic (pair volume stays linear in
    * bigK·N) but a straggler at 10⁹ rows (a 6×10⁷-row single-task
    * sort). Scaling rule is √N, NOT the linear `semanticCells` rule:
    * SemDeDup's within-cell work is PAIR-quadratic, so it needs a
    * fixed cell SIZE (cells ∝ N); the descent init's within-cell work
    * is the ±bigK ring — LINEAR in cell size — so the binding
    * constraints are the per-cell sort straggler (∝ N/cells) vs the
    * k-means assignment cost (∝ N·cells). cells = √(N/8) balances
    * them at O(N^1.5) total with an O(√N·log) straggler — the classic
    * IVF nlist ≈ √N rule. Floor 16 keeps every oracle SF
    * (sf0.001/0.01/0.1, N ≤ 2000 → √(N/8) ≤ 15.9) bit-identical to
    * the r11 sidecar-replay oracles; the ScaleGen dirs derive 50
    * (10×) and 158 (100×). Recall floor after the change is
    * re-measured by RecallCheck at both scaled dirs (CALIBRATION r12).
    */
  def descentCells(spark: SparkSession, dir: String): Int = {
    val n = corpusCount.getOrElseUpdate(spark, dir)(
      graft.Tables.embeddings(spark, dir).count())
    math.max(16, math.round(math.sqrt(n / 8.0)).toInt)
  }

  def knnGraphDescent(spark: SparkSession, dir: String, k: Int = 5,
                      iters: Int = 2, cells: Int = 0, rho: Double = 0.5,
                      collectStats: Boolean = false): DataFrame = {
    // cells = 0 (the default) derives the partition count from the
    // corpus; an explicit positive value pins it (tests, stats runs)
    val c = if (cells > 0) cells else descentCells(spark, dir)
    val key = (dir, k, iters, c, (rho * 100).toInt)
    // oracle sidecar (r11): the canonical descent graphs (k=5 feeds
    // B41's centrality, k=8 the B39 serving walk). The descent init is
    // xxhash64-derived — no SQL derivation — but EVERYTHING downstream
    // (symmetrize + M_max cap + the beam walk; the PageRank recurrence)
    // is deterministic SQL given the edges, so persisting them promotes
    // both consumers to full oracle rows (B31/B27's replay discipline).
    def maybeSidecar(built: DataFrame): DataFrame = {
      // the sidecar pin follows the DERIVED cell count (r12): at the
      // oracle SFs descentCells floors to 16, so the persisted graphs
      // stay bit-identical to the r11 oracles; a caller pinning any
      // OTHER cells gets no sidecar (it would desync the replay)
      if (graft.Sidecars.active && iters == 2 &&
          c == descentCells(spark, dir) &&
          rho == 0.5 && (k == 5 || k == 8))
        nndSidecarWritten.getOrElseUpdate(spark, (dir, k)) {
          built.coalesce(1).write.mode("overwrite")
            .parquet(graft.Sidecars.path(s"nnd_graph_k$k.parquet"))
          true
        }
      built
    }
    if (collectStats) {
      // stats runs bypass the cache (they must re-execute to count) but
      // still replace it without leaking the old persisted frame
      val built = buildDescent(spark, dir, k, iters, c, rho, collectStats)
      descentCache.put(spark, key, built).foreach(_.unpersist())
      maybeSidecar(built)
    } else maybeSidecar(descentCache.getOrElseUpdate(spark, key)(
      buildDescent(spark, dir, k, iters, c, rho, collectStats)))
  }

  /** Dense-rank remap of an id subset: (vec_id, rid) with rid a
    * contiguous [0, m) assignment in vec_id order — distributed sort +
    * zipWithIndex, deterministic. The descent machinery's hash-derived
    * long-range links draw `xxhash64(id, j) mod n`, which is uniform
    * only over a CONTIGUOUS id space; a sparse member subset run
    * through the raw modulus would concentrate every long link on
    * whichever ids happen to survive it. Checkpointed: the rank frame
    * is read by the init, both map-backs, and the nav-link derivation.
    */
  private[graft] def denseRanks(spark: SparkSession, members: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = members.select("vec_id").distinct().orderBy("vec_id")
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("rid", LongType)))
    graft.PlanCut.checkpointed(spark, spark.createDataFrame(
      sorted.rdd.map(_.getLong(0)).zipWithIndex()
        .map { case (v, r) => org.apache.spark.sql.Row(v, r) }, schema))
  }

  /** B17's NN-Descent build over an ARBITRARY member subset (r14,
    * VERDICT r13 #1): the B42 dispatch's at-scale branch for A21's
    * routed dynamic partitions, so a large shared partition never
    * re-enters the quadratic exact build. `ranked` is the subset's
    * `denseRanks` frame (callers that also derive nav long links share
    * it); the descent runs entirely in rank space — ring init over a
    * subset-sized IVF assignment (√(m/8) cells, the descentCells rule;
    * the fit is full-corpus as everywhere), hash long-range init over
    * the contiguous rank modulus — and the edge list maps back to real
    * ids at the end. Returns (src, nbr) in real id space, un-sorted
    * (the only consumer symmetrizes + caps, which repartitions anyway).
    */
  private[graft] def knnGraphDescentOnRanked(spark: SparkSession, dir: String,
                                             ranked: DataFrame, m: Long,
                                             k: Int, iters: Int = 2): DataFrame = {
    val c = math.max(16, math.round(math.sqrt(m / 8.0)).toInt)
    val idx = IvfIndex.getOrBuild(spark, dir, c)
    val e = IvfIndex.withCells(spark, dir, c)
      .join(ranked, "vec_id")
      .select(col("rid").as("vec_id"), col("embedding"), col("cell"))
    val edges = buildDescentFrom(spark, e, m, idx.centroids, k, iters,
      rho = 0.5, statsKey = None)
    val out = edges
      .join(ranked.select(col("rid").as("src"), col("vec_id").as("real_src")), "src")
      .join(ranked.select(col("rid").as("nbr"), col("vec_id").as("real_nbr")), "nbr")
      .select(col("real_src").as("src"), col("real_nbr").as("nbr"))
    edges.unpersist()
    out
  }

  private def buildDescent(spark: SparkSession, dir: String, k: Int,
                           iters: Int, cells: Int, rho: Double,
                           collectStats: Boolean): DataFrame = {
    val e = IvfIndex.withCells(spark, dir, cells)
    val n = e.count()
    val idx = IvfIndex.getOrBuild(spark, dir, cells)
    buildDescentFrom(spark, e, n, idx.centroids, k, iters, rho,
      statsKey = if (collectStats)
        Some((dir, k, iters, cells, (rho * 100).toInt)) else None)
  }

  /** The descent loop proper, over a prepared member frame `e` of
    * (vec_id, embedding, cell) whose vec_ids are DENSE in [0, n) —
    * the full corpus (buildDescent) or a rank-remapped subset
    * (knnGraphDescentOnRanked). Returns the final (src, nbr) edge
    * list, lineage-cut and persisted.
    */
  private def buildDescentFrom(spark: SparkSession, e: DataFrame, n: Long,
                               centroids: Array[Array[Float]], k: Int,
                               iters: Int, rho: Double,
                               statsKey: Option[(String, Int, Int, Int, Int)]): DataFrame = {
    // descend with a LARGER working neighborhood than the requested k:
    // sparse graphs barely propagate (few shared owners), so the
    // standard move is K ≈ 3k during descent, top-k projection at the
    // end. Candidate volume per round is |V|·(2K)² — the knob that
    // trades convergence speed for work.
    val bigK = math.max(3 * k, 10)
    // Init MUST mix locality with diverse long-range links: a pure
    // local init is CLOSED under neighbor-of-neighbor and descent can
    // never escape it. Long-range links are hash-derived —
    // deterministic stand-ins for NN-Descent's random init.
    //
    // The LOCAL half is ring-seeded (r11): each member meets its ±bigK
    // ring neighbors in a per-cell 1-D projection order (distance to
    // the own centroid — the same (cell, slot) equi-join machinery as
    // the exact build's bound pass, Ann.ringUpperBound) — O(bigK·N)
    // init pairs BY CONSTRUCTION. The previous same-cell ALL-PAIRS
    // join was N²/cells kernels at fixed cells: the identical latent
    // quadratic the r10 rewrite removed from the exact build, hiding
    // in the at-scale path's own init (VERDICT r10 #1). The ring
    // covers every intra-cell pair only when cell size ≤ bigK+1;
    // beyond that the seeded graph DIFFERS from the old all-pairs
    // init (measured: B39 recall moved 0.925 → 0.9125 at sf0.1 under
    // the ring init) — descent rounds recover cross-ring neighbors
    // and the re-pinned spec floors absorb the shift, while init
    // stays linear by construction.
    val rn = e
      // the own-cell distance IS the min over centroids (it assigned
      // the cell), same projection the medoid pick uses
      .withColumn("d", array_min(centroid_dists(col("embedding"), centroids)))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("cell").orderBy(col("d"), col("vec_id"))))
    val ringInit = rn
      .select(col("vec_id").as("src"), col("cell"),
        explode(sequence(col("rn") - bigK, col("rn") + bigK)).as("rn"))
      .join(rn.select(col("vec_id").as("dst"), col("cell"), col("rn")), Seq("cell", "rn"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    val longRange = e.select(col("vec_id").as("src"))
      .select(col("src"), explode(array((1 to bigK).map(j =>
        pmod(xxhash64(col("src"), lit(j)), lit(n))): _*)).as("dst"))
      .filter(col("src") =!= col("dst"))
    // Embedding attach via SHUFFLED HASH joins, dst side first (r13):
    // the candidate stream is 10⁸ rows at the 100× dir (measured
    // 88.7M at iters=2; round 3's new×all volume is larger) and the
    // default sort-merge join SORTS it with embedding arrays attached
    // — two ~50 GB sort spills per round, which is what turned the
    // first iters=3 build at 100× into an ENOSPC. A hash join streams
    // the fat side unsorted (the per-partition build side is
    // corpus/partitions embedding rows — bounded); joining dst FIRST
    // and src LAST leaves the output hash-partitioned by src, so the
    // groupBy(src) aggregation runs in the same stage with NO extra
    // exchange of the embedding-attached stream. Per-round shuffle is
    // then one slim cand exchange + one intermediate exchange, no
    // sorts — Dong et al.'s local join IS a hash join at scale.
    // the hint is gated on the at-scale regime (r17): below the exact
    // ceiling the member embeddings are megabytes and AQE's broadcast
    // join attaches them with ZERO exchanges of the candidate stream —
    // the forced shuffle paid 2 exchanges per rerank × (iters+2)
    // reranks at the oracle SFs for nothing. Above the ceiling the
    // forced hash join stands, for exactly the r13 reason above.
    def attach(side: DataFrame): DataFrame =
      if (n > KnnExactMaxN) side.hint("SHUFFLE_HASH") else side
    def rerank(cand: DataFrame, kk: Int): DataFrame = cand
      .join(attach(e.select(col("vec_id").as("dst"), col("embedding").as("eb"))), "dst")
      .join(attach(e.select(col("vec_id").as("src"), col("embedding").as("ea"))), "src")
      .groupBy("src")
      .agg(topk_ids(l2_dist(col("ea"), col("eb")), col("dst"), kk).as("ids"))
      .select(col("src"), explode(col("ids")).as("dst"))
    // checkpoint each round's edge list (persist + lineage rebase,
    // PlanCut): it feeds the next round several times (forward +
    // reverse + new-edge anti-join), and WITHOUT the rebase the
    // logical plan multiplies ~7× per round — plan ANALYSIS, not
    // execution, dominated every downstream action (r10: the NND
    // serving stack paid ~7 s/action of pure driver analysis at
    // sf0.001). Rounds older than the one still feeding the anti-join
    // are unpersisted as soon as the next materializes.
    val init = ringInit.union(longRange).distinct()
    statsKey.foreach(sk => descentInitStats(sk) = init.count())
    // rounds are DISK-checkpointed (r13): the in-memory rebase keeps
    // every superseded round's ~20 GB shuffle (100× dir) pinned via
    // lineage for the whole build — a full cut caps peak shuffle disk
    // at one round (see PlanCut.diskCheckpointed). The GC nudge is
    // gated on the at-scale regime (r17): below the exact-build
    // ceiling a round's shuffle is megabytes, and the forced full GC
    // on a ~90 GB heap paused every concurrent bench query (measured:
    // part of ann_knn_graph_nnd's 35 s pool row at 32 cores).
    val gcNudge = n > KnnExactMaxN
    var graph = PlanCut.diskCheckpointed(spark, rerank(init, bigK), gcNudge)
    var prev: Option[DataFrame] = None // previous round's graph
    val rho10 = math.max(1, math.round(rho * 10).toInt)
    for (rr <- 1 to iters) {
      val undirected = graph
        .union(graph.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      // incremental local join (Dong et al. §2.3): only pairs where at
      // least one side is a NEW edge are candidates — an old×old pair
      // shared an owner last round too, so it was already evaluated and
      // either kept (it's in `undirected`) or rejected forever (lists
      // only improve). Dropping them is lossless and cuts the (2K)²
      // blow-up to new×all. ρ-sampling then thins the NEW side
      // (deterministically: membership hashes (neighbor, owner, round)),
      // trading per-round volume for convergence speed.
      val newDirected = prev.fold(graph)(p =>
        graph.join(p, Seq("src", "dst"), "left_anti"))
      val newUnd = newDirected
        .union(newDirected.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      val adjAll = undirected.groupBy("src")
        .agg(slice(sort_array(collect_set(col("dst"))), 1, 2 * bigK).as("nbrs"))
      val adjNew = newUnd.groupBy("src")
        .agg(slice(sort_array(collect_set(col("dst"))), 1, 2 * bigK).as("new_nbrs"))
      val pairs = adjAll.join(adjNew, "src")
        .withColumn("new_nbrs", filter(col("new_nbrs"), x =>
          pmod(xxhash64(x, col("src"), lit(rr)), lit(10)) < lit(rho10)))
        .select(explode(col("new_nbrs")).as("a"), col("nbrs"))
        .select(col("a"), explode(col("nbrs")).as("b")) // share an owner
        .filter(col("a") =!= col("b"))
      val cand = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .union(undirected) // never drop current edges → monotone recall
        .distinct()
      if (rr == iters)
        statsKey.foreach(sk => descentCandStats(sk) = cand.count())
      // materialized (and FULLY lineage-cut) before releasing the
      // round it was built from
      val next = PlanCut.diskCheckpointed(spark, rerank(cand, bigK), gcNudge)
      // no longer feeds any computation — its checkpoint parquet is
      // dead too (the next round reads its OWN parquet on eviction),
      // so releaseDisk reclaims the files now, not at JVM exit
      prev.foreach(PlanCut.releaseDisk)
      prev = Some(graph)
      graph = next
    }
    val out = PlanCut.checkpointed(spark,
      rerank(graph, k) // project the working graph down to top-k
        .select(col("src"), col("dst").as("nbr")).orderBy("src", "nbr"))
    prev.foreach(PlanCut.releaseDisk)
    // the LAST round keeps its parquet: `out`'s rebase recomputes
    // through it if out's blocks are ever evicted
    graph.unpersist()
    out
  }

  /** Range search: all vectors within L2 distance tau of the query.
    * The distance predicate is evaluated inside the scan stage (codegen),
    * no top-k state at all — fully parallel.
    */
  def rangeSearch(spark: SparkSession, dir: String, tau: Double): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(queryVec(spark, dir, 0)))
      .filter(l2_dist(col("embedding"), col("qvec")) < tau)
      .select("vec_id")
      .orderBy("vec_id")

  /** Per-vector norms / dot products — the scalar vector-op surface
    * (pgvector's vector_norm / inner_product functions).
    */
  def vectorNorms(spark: SparkSession, dir: String, n: Int): DataFrame =
    corpus(spark, dir)
      .filter(col("vec_id") < n)
      .crossJoin(broadcast(queryVec(spark, dir, 0)))
      .select(
        col("vec_id"),
        round(vec_norm(col("embedding")), 4).as("norm"),
        round(dot(col("embedding"), col("qvec")), 4).as("dot_q"))
      .orderBy("vec_id")
}
