package graft.ann

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.vector._
import graft.operators.TopKAgg.topk_ids

/** nprobe → recall model — the Spark half of the reference's parameter
  * fitting (controller/dynamic_partition/get_parameter.py:135
  * `get_recall_parameters` / :162 `get_QPS_parameters` fit recall(ef)
  * and QPS curves that feed its cost model; hnsw/analysis/
  * analysis_hnsw_recall.py measures the curve). The engine's probe
  * knob is nprobe, and its recall curve is MEASURABLE FROM ONE
  * DISTRIBUTED PASS, no per-nprobe search loop:
  *
  *   an exact top-k neighbor is captured at probe depth p  iff  its
  *   cell's rank in the query's centroid-distance ordering is ≤ p
  *
  * so the whole recall(nprobe) curve is the CDF of neighbor-cell
  * ranks over the workload — one batch ground-truth job (corpus
  * scanned once, queries broadcast) joined to the cell assignment,
  * then a k-row histogram. At 100 TB this is the same cadence as any
  * index-metadata build: one pass, a tiny sidecar out.
  *
  * The fitted form is the saturating curve IVF mass-coverage follows:
  * 1 − recall(p) ≈ exp(−(α + β·p)), i.e. ln(1 − recall) linear in
  * nprobe — fit by least squares over the measured points, then
  * inverted to pick the smallest nprobe whose PREDICTED recall meets a
  * target. `CALIBRATION.md` records predicted vs measured; the
  * model-driven path is asserted ≥ the fixed-nprobe recall in
  * RecallModelSpec.
  */
object RecallModel {

  /** (nprobe, recall) measured points, 1 ≤ nprobe ≤ cells. */
  final case class Curve(cells: Int, k: Int, points: Seq[(Int, Double)]) {
    /** Least-squares fit of ln(1 − r) = −(α + β·p) over the
      * UNSATURATED points only — a clamped ln(1 − 1) would dominate
      * the regression and wreck the small-p region the pick actually
      * uses (on an easy corpus most of the curve sits at exactly 1).
      * With fewer than two unsaturated points the curve is already at
      * 1 almost everywhere: fall back to a slope that saturates the
      * model at the first measured-1 depth.
      */
    lazy val (alpha: Double, beta: Double) = {
      val usable = points.filter(_._2 < 0.999)
      if (usable.length >= 2) {
        val xs = usable.map(_._1.toDouble)
        val ys = usable.map { case (_, r) => -math.log(1.0 - r) }
        val n = xs.length.toDouble
        val (mx, my) = (xs.sum / n, ys.sum / n)
        val sxx = xs.map(x => (x - mx) * (x - mx)).sum
        val b = if (sxx == 0) 0.0
          else xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / sxx
        (my - b * mx, b)
      } else {
        val pSat = points.find(_._2 >= 0.999).map(_._1).getOrElse(cells)
        (0.0, -math.log(1e-3) / pSat)
      }
    }

    def predict(nprobe: Int): Double =
      math.max(0.0, 1.0 - math.exp(-(alpha + beta * nprobe)))

    /** Smallest nprobe whose MEASURED recall meets `target` (capped at
      * `cells` — probing everything is always lossless). The measured
      * points already cover every depth 1..cells at zero extra cost, so
      * the pick never trusts the fit where a real measurement exists —
      * a fitted pick can land below target on the very workload it was
      * measured on (CALIBRATION.md round-5: 0.9-target pick measuring
      * 0.871). The fitted curve remains for reporting and for
      * extrapolating beyond the measured cell count (`predict`).
      */
    def nprobeFor(target: Double): Int =
      points.sortBy(_._1).collectFirst { case (p, r) if r >= target => p }
        .getOrElse(cells)
  }

  private val curveCache = TrieMap.empty[(String, Int, Int), Curve]

  /** A15 workload query vectors: (query_id, qvec_id, qvec). */
  private def workloadQueries(spark: SparkSession, dir: String): DataFrame =
    graft.rbac.Maintenance.workloadGen(spark, dir)
      .select(col("query_id"), col("vec_id").as("qvec_id")).distinct()
      .join(Tables.embeddings(spark, dir), col("qvec_id") === col("vec_id"))
      .select(col("query_id"), col("qvec_id"), col("embedding").as("qvec"))

  /** Per-query cell ranking (query_id as q2, list_id, cell_rank):
    * |queries|×cells tiny frame ordered by (distance, cid) — the same
    * tie rule probeLists uses.
    */
  private def queryCellRanks(spark: SparkSession, dir: String, cells: Int,
                             queries: DataFrame): DataFrame = {
    val idx = IvfIndex.getOrBuild(spark, dir, cells)
    val centsDf = spark.createDataFrame(
      idx.centroids.zipWithIndex.toSeq.map { case (c, i) => (i, c) })
      .toDF("cid", "centroid")
    queries.crossJoin(broadcast(centsDf))
      .withColumn("d", l2_dist(col("qvec"), col("centroid")))
      .withColumn("cell_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("d"), col("cid"))))
      .select(col("query_id").as("q2"), col("cid").as("list_id"), col("cell_rank"))
  }

  /** Measure the recall curve of the corpus IVF index over the A15
    * workload (one ground-truth pass + one tiny histogram), cached per
    * (dir, cells, k) like every other index sidecar.
    */
  private val curveLocks = TrieMap.empty[(String, Int, Int), Object]

  def measure(spark: SparkSession, dir: String, cells: Int = 16, k: Int = 10): Curve = {
    val key = (dir, cells, k)
    // fast path: no lock once built
    curveCache.get(key) match {
      case Some(c) => c
      case None =>
        // PER-KEY lock (TrieMap.getOrElseUpdate is atomic, so each key
        // gets exactly one monitor): concurrent first-touch callers for
        // the same key share ONE distributed ground-truth build, while
        // callers for a DIFFERENT (dir, cells, k) no longer serialize
        // behind an unrelated job (a whole-object lock held across a
        // Spark job blocked them)
        curveLocks.getOrElseUpdate(key, new Object).synchronized {
          curveCache.getOrElseUpdate(key, {
      // workload query vectors (A15: vec_id = 7·user mod n, users ≤ 20)
      val queries = workloadQueries(spark, dir)
      // exact top-k per query: one corpus scan, queries broadcast,
      // shuffle = |queries|·k ids (the batch ground-truth shape).
      // The query vector is itself a corpus row: exclude it, as every
      // serving path (IvfIndex.search vec_id =!= qid) and the repo's
      // ground-truth convention do — a self-match at distance 0 always
      // lands at cell_rank 1 and would inflate the whole curve by 1/k,
      // making the model under-pick nprobe for a recall target
      val exact = Tables.embeddings(spark, dir)
        .crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qvec_id"))
        .groupBy("query_id")
        .agg(topk_ids(l2_dist(col("embedding"), col("qvec")), col("vec_id"), k).as("ids"))
      val qcells = queryCellRanks(spark, dir, cells, queries)
      // rank of each exact neighbor's cell in its query's ordering —
      // the histogram is ≤ cells rows
      val cellRankHist = exact
        .select(col("query_id"), explode(col("ids")).as("nbr"))
        .join(IvfIndex.assignments(spark, dir, cells)
          .withColumnRenamed("list_id", "nbr_cell"), col("nbr") === col("vec_id"))
        .join(broadcast(qcells),
          col("query_id") === col("q2") && col("nbr_cell") === col("list_id"))
        .groupBy("cell_rank").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
      val nQueries = queries.count().toDouble
      val total = nQueries * k
      val pts = (1 to cells).map { p =>
        p -> (1 to p).map(r => cellRankHist.getOrElse(r.toLong, 0L)).sum / total
      }
      Curve(cells, k, pts)
          })
        }
    }
  }

  /** Query surface (`ann_recall_model`, rows-only): measured vs
    * predicted recall per nprobe — the engine's CALIBRATION.md table.
    */
  def report(spark: SparkSession, dir: String, cells: Int = 16, k: Int = 10): DataFrame = {
    val c = measure(spark, dir, cells, k)
    import spark.implicits._
    c.points.map { case (p, r) =>
      (p, math.round(r * 10000) / 10000.0,
        math.round(c.predict(p) * 10000) / 10000.0)
    }.toDF("nprobe", "measured_recall", "predicted_recall")
  }

  /** The QPS half of the reference's get_parameter (get_parameter.py
    * :162 get_QPS_parameters) — expressed DETERMINISTICALLY as the
    * recall/cost frontier instead of wall timings (which the shared
    * host renders unrepeatable — SKEW.md): per probe depth, the
    * average fraction of the corpus a probe search scans (cumulative
    * probed-list size over the workload's cell rankings) next to the
    * recall the same depth buys. QPS prediction = 1 / (fixed per-query
    * overhead + scan_fraction × corpus × per-row kernel cost), with
    * the per-row constants measured in CALIBRATION.md (ScanCost, t(n)
    * fit) — deterministic inputs, so this frame is reproducible across
    * rounds while a timed QPS number is not.
    *
    * (nprobe, scan_fraction, measured_recall) is the frontier the
    * reference plots to pick its operating point; the knee is where
    * d(recall)/d(scan) collapses.
    */
  def costFrontier(spark: SparkSession, dir: String,
                   cells: Int = 16, k: Int = 10): DataFrame = {
    val queries = workloadQueries(spark, dir)
    val sizes = IvfIndex.buildReport(spark, dir, cells) // (list_id, n_vectors)
    val nQ = queries.count().toDouble
    val total = Tables.embeddings(spark, dir).count().toDouble
    // per (query, rank): cumulative rows scanned at that probe depth —
    // |queries|×cells rows, a window cumsum, then averaged per depth.
    // LEFT join + coalesce: buildReport omits EMPTY cells (its groupBy
    // has no row for them), and an inner join would silently drop the
    // (query, rank) rows ranking an empty cell — corrupting the
    // per-depth averages and even losing whole nprobe rows
    val cum = queryCellRanks(spark, dir, cells, queries)
      .join(broadcast(sizes), Seq("list_id"), "left_outer")
      .withColumn("n_vectors", coalesce(col("n_vectors"), lit(0L)))
      .withColumn("cum_rows", sum("n_vectors").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("q2").orderBy("cell_rank")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("cell_rank").as("nprobe"))
      .agg((sum("cum_rows") / nQ).as("avg_rows_scanned"))
    val curve = measure(spark, dir, cells, k)
    import spark.implicits._
    val recall = curve.points.toDF("nprobe", "measured_recall")
    cum.join(recall, "nprobe")
      .select(col("nprobe"),
        round(col("avg_rows_scanned"), 1).as("avg_rows_scanned"),
        round(col("avg_rows_scanned") / total, 4).as("scan_fraction"),
        round(col("measured_recall"), 4).as("measured_recall"))
      .orderBy("nprobe")
  }

  /** Model-driven probe search: nprobe picked from the fitted curve for
    * a recall target instead of a constant — the get_parameter loop
    * closed (measure → fit → serve).
    */
  def searchAtTarget(spark: SparkSession, dir: String, targetRecall: Double,
                     cells: Int = 16, k: Int = 10, topk: Int = 10,
                     qid: Long = 0): DataFrame = {
    val nprobe = measure(spark, dir, cells, k).nprobeFor(targetRecall)
    IvfIndex.search(spark, dir, cells, nprobe, topk, qid)
  }
}
