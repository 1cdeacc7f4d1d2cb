package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.GraphSearch

/** Round-10 pins: the repairedGraph cache keys on every parameter the
  * edges depend on (the r8 alpha-in-key lesson re-applied), repairEdges
  * is idempotent / re-insert-safe, and G18's streaming graph insertion
  * equals the batch composition of the same trigger sequence exactly.
  */
class Round10Spec extends AnyFunSuite {
  import SparkTest._

  private def edgesOf(g: DataFrame): Seq[(Long, Long)] =
    g.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("repairedGraph cache keys on (ef, rounds): non-default walk params build a distinct graph") {
    val sp = spark
    val g1 = GraphSearch.repairedGraph(sp, sf)
    val g2 = GraphSearch.repairedGraph(sp, sf, ef = 2, rounds = 1)
    assert(g1 ne g2,
      "non-default (ef, rounds) must miss the default-key cache entry")
    // the tiny beam links new nodes to worse neighbors — the repaired
    // edge sets genuinely differ, so serving the wrong cache entry
    // would be a silent correctness bug, not a perf detail
    assert(edgesOf(g1) != edgesOf(g2),
      "ef=2/rounds=1 must repair the graph differently than ef=64/rounds=5")
    // same params → same cached instance (the cache still caches)
    assert(GraphSearch.repairedGraph(sp, sf) eq g1)
  }

  test("repairEdges is idempotent: a re-applied batch replaces lists, never duplicates them") {
    val sp = spark
    val cutoff = GraphSearch.insertCutoff(sp, sf)
    val base = GraphSearch.servingGraph(sp, sf, baseMax = cutoff)
    val links = GraphSearch.insertNeighbors(sp, sf)
      .select(col("src"), col("nbr"))
    val g1 = GraphSearch.repairEdges(sp, sf, base, links)
    val e1 = edgesOf(g1)
    // no duplicate (src, nbr) rows in the repaired relation
    assert(e1.distinct.size == e1.size, "repaired graph carries duplicate edges")
    // degree caps: every node ≤ 2·gk; batch srcs exactly gk out-links
    val deg = e1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(deg.values.forall(_ <= 2 * GraphSearch.GraphK))
    val srcIds = links.select("src").distinct().collect().map(_.getLong(0)).toSet
    assert(srcIds.forall(s => deg(s) == GraphSearch.GraphK))
    // the RE-insert: apply the same batch to the already-repaired graph
    // — under the pre-r10 code the srcs' old out-links survive beside
    // the new ones (duplicate edges, lists beyond the cap); fixed, the
    // repair is exactly idempotent
    val e2 = edgesOf(GraphSearch.repairEdges(sp, sf, g1, links))
    assert(e2 == e1, "repairEdges(repairEdges(g, links), links) must equal repairEdges(g, links)")
  }

  test("scaleRatios: per-key ratios over the clean-map intersection, superlinear = beyond the data factor") {
    val cur = Map("a" -> 1.0, "b" -> 2.0, "zero" -> 0.0, "only_cur" -> 5.0)
    val other = Map("a" -> 2.0, "b" -> 44.0, "zero" -> 9.0, "only_other" -> 1.0)
    val (n, med, p90, sup) = Bench.scaleRatios(cur, other, factor = 10.0)
    // zero-denominator and non-intersecting keys never produce a ratio
    assert(n == 2)
    assert(med == 22.0 && p90 == 22.0) // upper-median of (2.0, 22.0)
    // only the key whose time grew faster than the 10x data is flagged
    assert(sup == Seq("b" -> 22.0))
    assert(Bench.scaleRatios(Map("x" -> 1.0), Map("y" -> 1.0), 10.0)._1 == 0)
  }

  test("data fingerprint walks nested table dirs and refuses an empty dataset") {
    val dir = java.nio.file.Files.createTempDirectory("fp10_").toFile
    // an empty (or missing) dataset dir must never hash to a
    // plausible digest a cross-round diff could "match"
    assert(Bench.dataFingerprint(dir.toString) == "EMPTY_DATASET")
    assert(Bench.dataFingerprint(new java.io.File(dir, "nope").toString) == "EMPTY_DATASET")
    // a table stored as a parquet DIRECTORY: rewriting a leaf file in
    // place (same parent entry name) must move the fingerprint
    val tdir = new java.io.File(dir, "lineitem.parquet")
    tdir.mkdirs()
    val leaf = new java.io.File(tdir, "part-00000.parquet")
    java.nio.file.Files.write(leaf.toPath, "v1".getBytes)
    val fp0 = Bench.dataFingerprint(dir.toString)
    assert(fp0.matches("[0-9a-f]{16}"))
    java.nio.file.Files.write(leaf.toPath, "v2v2".getBytes)
    assert(Bench.dataFingerprint(dir.toString) != fp0,
      "a nested leaf rewrite must move the fingerprint")
  }

  /** Stage `df` as ONE parquet file at `target` (an arriving batch file
    * for the FileStreamSource watch dir).
    */
  private def stageOne(df: DataFrame, scratch: String, target: java.nio.file.Path): Unit = {
    df.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.move(part.toPath, target)
  }

  test("G18 streaming graph insertion equals the batch composition of its trigger sequence") {
    val sp = spark
    val cutoff = GraphSearch.insertCutoff(sp, sf)
    val tailIds = (cutoff until cutoff + GraphSearch.InsertTail).toSet
    val half = cutoff + GraphSearch.InsertTail / 2
    val tmp = java.nio.file.Files.createTempDirectory("g18_").toString
    val tail = Tables.embeddings(sp, sf).filter(col("vec_id") >= cutoff)
    stageOne(tail.filter(col("vec_id") < half), s"$tmp/s0",
      java.nio.file.Paths.get(tmp, "vecs", "b0.parquet"))
    stageOne(tail.filter(col("vec_id") >= half), s"$tmp/s1",
      java.nio.file.Paths.get(tmp, "vecs", "b1.parquet"))
    // warm the base index state the stream reads (graph + medoids are
    // session-cached index builds, not per-trigger work) so the
    // persisted-block accounting below isolates STREAM-owned state
    val base = GraphSearch.servingGraph(sp, sf, baseMax = cutoff)
    val medoids = GraphSearch.cellMedoids(sp, sf, baseMax = cutoff)
    val n0 = sp.sparkContext.getPersistentRDDs.size

    // maxFilesPerTrigger=1: this spec tests the trigger SEQUENCE
    // itself (2 files → 2 triggers, per-trigger state release); the
    // shipped default drains all files in one batch (r12)
    val (q, h) = graft.streaming.VectorStream.graphInsertStream(
      sp, sf, s"$tmp/vecs", s"$tmp/ckpt", maxFilesPerTrigger = 1)
    q.awaitTermination()

    // trigger accounting: one file per trigger, every tail id exactly once
    assert(h.triggerBatches.size == 2, s"expected 2 triggers, got ${h.triggerBatches.size}")
    assert(h.triggerBatches.flatMap(identity).toSet == tailIds)
    assert(h.triggerBatches.map(_.size).sum == GraphSearch.InsertTail)
    // per-trigger state release: after draining, the stream owns
    // exactly ONE persisted graph (the current one) beyond the base
    assert(sp.sparkContext.getPersistentRDDs.size == n0 + 1,
      "each trigger must release the superseded graph on swap")

    // batch replay of the SAME trigger sequence: sequential insertStep
    // from the base graph must land on the identical edge relation
    var g: DataFrame = base
    for (ids <- h.triggerBatches) {
      val batch = Tables.embeddings(sp, sf)
        .filter(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val next = GraphSearch.insertStep(sp, sf, g, medoids, batch)
      if (g ne base) g.unpersist(blocking = true)
      g = next
    }
    val want = edgesOf(g)
    val got = edgesOf(h.currentGraph)
    assert(got == want, "drained stream graph must equal the batch composition exactly")
    // the maintained graph is a valid index: every inserted node holds
    // at least its own gk out-links (an earlier trigger's node gains
    // reciprocal edges when a later trigger links to it — bounded by
    // the 2·gk cap) and is reachable via a reciprocal edge
    val bySrc = got.groupBy(_._1)
    assert(tailIds.forall(id => bySrc.get(id).exists(s =>
      s.size >= GraphSearch.GraphK && s.size <= 2 * GraphSearch.GraphK)))
    val reachable = got.collect { case (s, n) if tailIds(n) => n }.toSet
    assert(reachable.nonEmpty, "no inserted node is reachable from the base graph")
    // release hygiene: dropping the replay graph and the stream's
    // handle returns the session to the pre-stream persisted state
    g.unpersist(blocking = true)
    h.release()
    assert(sp.sparkContext.getPersistentRDDs.size == n0)
  }

  test("B41: NND centrality equals the driver-replayed PageRank recurrence at 4dp") {
    // B39's replay discipline applied to the centrality consumer: the
    // collected NND edge set is tiny (k·N), so the full 10-round
    // recurrence r0=1, r' = 0.15 + 0.85·Σ r(u)/outdeg(u) replays in
    // driver code; GraphX message-sum order can differ from the
    // driver's sorted fold only below the operator's own 4dp rounding.
    val sp = spark
    // default descent params — the SAME cached graph knnCentralityNnd reads
    val edges = ann.Ann.knnGraphDescent(sp, sf, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val inBy = edges.groupBy(_._2)
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var rank = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 10) {
      rank = nodes.map { v =>
        val in = inBy.getOrElse(v, Array.empty)
          .sortBy(_._1).map { case (u, _) => rank(u) / outDeg(u) }.sum
        v -> (0.15 + 0.85 * in)
      }.toMap
    }
    val got = ann.Ann.knnCentralityNnd(sp, sf, 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == rank.keySet, "vertex sets differ")
    val bad = nodes.filter(v =>
      math.abs(got(v) - BigDecimal(rank(v)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) > 1e-9)
    assert(bad.isEmpty,
      s"${bad.size} ranks diverge from the driver replay, e.g. ${bad.take(3).map(v => (v, got(v), rank(v)))}")
  }

  test("knn build: ring bound is O(k·N); pivot filter prunes clustered data losslessly") {
    // The benchmark corpus is deliberately isotropic — the worst case
    // for ANY metric pruning (ScaleStats measures the pivot filter
    // absorbing ~0 there; the quadratic joined stream is inherent to
    // EXACT high-dim kNN, which is why NN-Descent is the at-scale build
    // path). This pins the filter's value on the data it exists for:
    // clustered corpora, where the ring bound is tight and the 16-pivot
    // triangle gap rejects cross-cluster pairs before the kernel.
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(12345)
    val dim = 8; val nClusters = 40; val per = 10; val k = 8
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian().toFloat * 5f)
    val rows = for {
      c <- 0 until nClusters; j <- 0 until per
    } yield ((c * per + j).toLong,
      centers(c).map(x => x + rnd.nextGaussian().toFloat * 0.01f), c.toString)
    val dir = java.nio.file.Files.createTempDirectory("knn_clustered_").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (ring, joined, kernel) = ann.Ann.knnCandidateCounts(sp, dir, k, cells = 16)
    val n = nClusters * per
    assert(ring <= 4L * k * n, s"ring bound pairs $ring exceed 4kN = ${4 * k * n}")
    // on clustered data the filter must absorb the bulk of the joined
    // stream before the kernel (assert a lax 2x so KMeans seed drift
    // can't flake the suite; the measured ratio is recorded in
    // CALIBRATION.md's round-10 section)
    assert(kernel * 2 < joined,
      s"pivot filter pruned too little on clustered data: $kernel of $joined")
    // and it is LOSSLESS: the built graph equals brute force exactly
    val got = ann.Ann.knnGraph(sp, dir, k, cells = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = rows.map { case (id, e, _) => id -> e }.toMap
    val want = (for {
      (id, e) <- vecs.toSeq; nbr <- vecs.toSeq.filter(_._1 != id)
        .map { case (j, f) => (SparkTest.refL2(e, f), j) }
        .sorted.take(k)
    } yield (id, nbr._2)).toSet
    assert(got == want, "pivot-filtered build diverged from brute force on clustered data")
  }
}
