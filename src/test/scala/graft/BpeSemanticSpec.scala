package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.text.Bpe

/** D19/D20: the distributed BPE trainer/encoder against an independent
  * single-machine reference implementation (the keys are rows-only —
  * an iterative merge loop has no DuckDB replay — so this equality IS
  * their correctness gate).
  */
class BpeSpec extends AnyFunSuite {
  import SparkTest._

  private val NumMerges = 24

  // ---- single-machine reference implementation (classic BPE) ----

  private def refMergeStep(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(wordCounts: Map[String, Long], numMerges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var words: Map[String, (Vector[String], Long)] = wordCounts.map {
      case (w, c) => w -> ((w.map(_.toString).toVector :+ Bpe.EndMark, c))
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (syms, c)) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((r, a, b, n))
        words = words.map { case (w, (syms, c)) => w -> ((refMergeStep(syms, a, b), c)) }
        r += 1
      }
    }
    (merges.result(), words.map { case (w, (syms, _)) => w -> syms })
  }

  private lazy val wordCounts: Map[String, Long] =
    Tables.documents(spark, sf)
      .select(explode(Bpe.wordsOf(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("merge fold applies the classic non-overlapping left-to-right rule") {
    val sparkRef = spark; import sparkRef.implicits._
    val df = Seq(
      Seq("a", "a", "a", "a"),
      Seq("a", "a", "a"),
      Seq("x", "a", "a", "y"),
      Seq("b", "a")).toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("aa", "aa"),
      List("aa", "a"),
      List("x", "aa", "y"),
      List("b", "a")))
  }

  test("distributed trainer emits exactly the reference merge table") {
    val (refMerges, _) = refTrain(wordCounts, NumMerges)
    val got = Bpe.trainReport(spark, sf, NumMerges).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refMerges,
      s"merge tables differ:\n spark=${got.take(6)}\n ref  =${refMerges.take(6)}")
  }

  test("every trained symbol sequence reconstructs its word exactly") {
    val m = Bpe.train(spark, sf, NumMerges)
    val bad = m.words
      .filter(concat_ws("", col("syms")) =!= concat(col("word"), lit(Bpe.EndMark)))
      .count()
    assert(bad == 0L)
  }

  test("encode matches the reference tokenization and compresses vs the char floor") {
    val (_, refWords) = refTrain(wordCounts, NumMerges)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), Bpe.wordsOf(col("text")).as("words"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val expect = docs.map { case (id, ws) =>
      id -> ((ws.size.toLong, ws.map(w => refWords(w).size.toLong).sum))
    }.toMap
    val got = Bpe.encodeReport(spark, sf, NumMerges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (id, (nw, nt)) =>
      assert((nw, nt) == expect(id),
        s"doc $id: spark=($nw,$nt) ref=${expect(id)}")
    }
    // 24 merges must strictly beat the untrained floor (chars + 1/word)
    val floor = docs.map { case (_, ws) => ws.map(_.length.toLong + 1L).sum }.sum
    val total = got.values.map(_._2).sum
    assert(total < floor, s"expected compression: tokens=$total floor=$floor")
  }
}

/** D21: bigram-LM scoring (oracle-checked; this spec pins the add-1
  * smoothing invariants the oracle comparison can't express).
  */
class LmScoreSpec extends AnyFunSuite {
  import SparkTest._

  test("lm score covers every doc with positive nll inside the smoothing bound") {
    val rows = graft.text.TextOps.lmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("nw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == docs.size, "every doc must be scored")
    // one bigram per word (BOS context makes the first word a bigram)
    rows.foreach { case (id, nb, _) => assert(nb == docs(id), s"doc $id: $nb bigrams") }
    // add-1 smoothing bounds every per-bigram -log P by ln(maxContext + V).
    // The <s> BOS context occurs once per DOCUMENT, so the max context
    // count is max(word frequency, doc count) — on a corpus of many
    // short docs D exceeds every word frequency and a maxCu-only bound
    // would falsely fail a one-word doc's BOS bigram.
    val bi = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
    val v = bi.agg(countDistinct("w")).head().getLong(0)
    val maxCu = bi.groupBy("w").count().agg(max("count")).head().getLong(0)
    val bound = math.log((math.max(maxCu, docs.size.toLong) + 1 + v).toDouble)
    rows.foreach { case (id, _, nll) =>
      assert(nll > 0 && nll <= bound + 1e-6, s"doc $id: nll=$nll outside (0, $bound]")
    }
  }
}

/** D22: compression-ratio quality signal (rows-only — this driver
  * re-run of the identical Deflater is the correctness gate) plus the
  * discrimination property the signal exists for.
  */
class CompressionRatioSpec extends AnyFunSuite {
  import SparkTest._

  test("deflate kernel matches a driver Deflater exactly and flags repetition") {
    val got = graft.text.TextOps.compressionRatio(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == docs.size)
    got.foreach { case (id, nb, db, ratio) =>
      val t = docs(id)
      assert(nb == t.getBytes("UTF-8").length.toLong)
      val ref = graft.functions.CompressionKernels.deflateSize(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 6)
      assert(db == ref, s"doc $id: kernel $db vs driver $ref")
      assert(ratio == BigDecimal(db.toDouble / nb)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // discrimination: a looped phrase must compress far below prose
    val sparkRef = spark; import sparkRef.implicits._
    val synth = Seq(
      1L -> ("the value is high and the customer agrees " * 40),
      2L -> docs.values.head).toDF("id", "t")
      .select(col("id"),
        (graft.functions.compression.deflate_size(col("t")).cast("double") /
          octet_length(col("t"))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(synth(1L) < synth(2L) / 2,
      s"looped text must compress well below prose: $synth")
    // denominator is BYTES (multibyte text must not inflate the ratio)
    // and an empty doc yields null, not an ANSI divide-by-zero failure
    val edge = Seq(1L -> "夏は熱い夏は熱い夏は熱い夏は熱い", 2L -> "").toDF("doc_id", "text")
    val er = edge
      .select(col("doc_id"),
        octet_length(col("text")).cast("bigint").as("n_bytes"),
        graft.functions.compression.deflate_size(col("text")).as("deflate_bytes"))
      .withColumn("ratio",
        when(col("n_bytes") > 0,
          round(col("deflate_bytes").cast("double") / col("n_bytes"), 4)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(er(1L)._1 == 48L, s"CJK doc must count UTF-8 bytes: ${er(1L)}")
    assert(er(1L)._2.exists(_ < 1.0),
      s"repetitive CJK text must still read as compressible: ${er(1L)}")
    assert(er(2L)._2.isEmpty, s"empty doc must yield null ratio: ${er(2L)}")
    // and the kernel stays inside whole-stage codegen
    val df = graft.text.TextOps.compressionRatio(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("deflate_size")),
      s"deflate_size fell out of codegen:\n$plan")
  }
}

/** B27: kNN-graph PageRank centrality — rows-only; the correctness
  * gate is an exact driver power iteration with GraphX's
  * staticPageRank recurrence over the same edge set.
  */
class KnnCentralitySpec extends AnyFunSuite {
  import SparkTest._

  test("graphx pagerank matches the driver power iteration on the same edges") {
    val k = 5; val iters = 10
    val edges = graft.ann.Ann.knnGraph(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outDeg = edges.groupBy(_._1).map { case (v, es) => v -> es.length }
    var rank = verts.map(_ -> 1.0).toMap
    for (_ <- 0 until iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      edges.foreach { case (u, v) => contrib(v) += rank(u) / outDeg(u) }
      rank = verts.map(v => v -> (0.15 + 0.85 * contrib(v))).toMap
    }
    val got = graft.ann.Ann.knnCentrality(spark, sf, k, iters).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == rank.keySet)
    got.foreach { case (v, pr) =>
      assert(math.abs(pr - rank(v)) < 1e-4, s"vec $v: graphx=$pr driver=${rank(v)}")
    }
    // centrality must actually discriminate (not a constant vector)
    assert(got.values.max > got.values.min * 1.5,
      s"degenerate centrality: [${got.values.min}, ${got.values.max}]")
  }
}

/** C10: SemDeDup — within-cluster semantic dedup. Rows-only key; this
  * spec is its correctness gate: pair subset vs the EXACT C5 miner,
  * row-exact removal under the paper's keep rule, and a no-crossJoin /
  * bounded-broadcast plan.
  */
class DedupSemanticSpec extends AnyFunSuite {
  import SparkTest._

  private val Tau = 0.45
  private val Cells = 8

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dp += x * y; na += x * x; nb += y * y; i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dp / den
  }
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // vectors + the engine's own cell assignment (cluster membership is
  // k-means-defined, not part of the contract under test)
  private lazy val assigned: Array[(Long, Array[Float], Int)] = {
    import graft.functions.vector._
    val idx = graft.ann.IvfIndex.getOrBuildUnit(spark, sf, Cells)
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        nearest_centroid(vec_normalize(col("embedding")), idx.centroids).as("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
  }

  private lazy val withinClusterPairs: Seq[(Long, Long, Double, Int)] = for {
    (v1, e1, c1) <- assigned.toSeq
    (v2, e2, c2) <- assigned.toSeq
    if v1 < v2 && c1 == c2
    s = r4(cos(e1, e2)) if s >= Tau
  } yield (v1, v2, s, c1)

  test("semantic pairs are a strict subset of the exact C5 pair set") {
    val exact = Dedup.embeddingPairs(spark, sf, Tau, Cells).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val semantic = withinClusterPairs.map(p => (p._1, p._2)).toSet
    assert(semantic.subsetOf(exact),
      s"within-cluster pairs not found by the exact miner: ${semantic -- exact}")
    // deterministic under the seeded k-means: pin the lossy trade at
    // ≥ half the exact pairs on this data (measured 5/7)
    assert(semantic.size * 2 >= exact.size,
      s"coverage collapsed: ${semantic.size}/${exact.size}")
    info(s"semantic coverage: ${semantic.size}/${exact.size} exact pairs")
  }

  test("removal rows match the paper's keep rule exactly") {
    val idx = graft.ann.IvfIndex.getOrBuildUnit(spark, sf, Cells)
    val csim = assigned.map { case (v, e, c) => v -> r4(cos(e, idx.centroids(c))) }.toMap
    val loserOf = (p: (Long, Long, Double, Int)) => {
      val (v1, v2, _, _) = p
      if (csim(v1) > csim(v2) || (csim(v1) == csim(v2) && v1 > v2)) v1 else v2
    }
    val expect = withinClusterPairs.groupBy(loserOf).map { case (v, ps) =>
      val cell = assigned.find(_._1 == v).get._3
      (v, cell, csim(v), ps.size.toLong)
    }.toSet
    val df = Dedup.semanticDedup(spark, sf, Tau, Cells)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == expect, s"spark=$got\nref=$expect")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pairs must come from the cell equi-join:\n$plan")
  }

  test("with auto-broadcast off no broadcast subtree reads the corpus") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val exec = Dedup.semanticDedup(spark, sf, Tau, Cells)
        .queryExecution.executedPlan
      val plan = exec.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"))
      // the only hinted frame is the k-row centroid LocalTableScan —
      // any remaining BroadcastExchange must NOT scan a file (the
      // corpus); the cell self-join itself degrades to a shuffle join
      exec.foreach {
        case b: BroadcastExchangeExec =>
          assert(!b.exists(_.isInstanceOf[FileSourceScanExec]),
            s"broadcast subtree reads the corpus:\n$b")
        case _ =>
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
  }
}
