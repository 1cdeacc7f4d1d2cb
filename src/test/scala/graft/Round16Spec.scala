package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 pins — bench-artifact fidelity (VERDICT r15 #1/#3, ADVICE
  * r15): the tail-visible line must stay parseable and the superlinear
  * map must carry its stamped attributions machine-readably.
  */
class Round16Spec extends AnyFunSuite {

  test("superlinearJson: stamped laws carry an attribution tag, unknown keys stay bare alarms") {
    val json = Bench.superlinearJson(
      Seq("dedup_embedding_auto" -> 19.152, "mystery_key" -> 3.2))
    assert(json ==
      """{"dedup_embedding_auto":{"ratio":19.15,"attributed":"c5_candidate_law"},"mystery_key":{"ratio":3.20}}""",
      s"rendered: $json")
    assert(Bench.superlinearJson(Nil) == "{}")
  }

  test("superlinear attributions name keys that exist in the query surface") {
    // a typo'd key in the attribution map would silently never fire —
    // every attributed key must be a real SparkEntry query key
    for (k <- Bench.SuperlinearAttribution.keys)
      assert(SparkEntry.queries.contains(k), s"attributed key $k is not a query")
  }

  test("fmt is locale-fixed fixed-point") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // comma decimals
      assert(Bench.fmt(19.152, 2) == "19.15")
      assert(Bench.fmt(1.0, 1) == "1.0")
    } finally java.util.Locale.setDefault(prev)
  }

  test("compact tail line budget: top-8/top-10 maps + five compact scale blocks fit a 2000-char capture") {
    // the r15 regression, re-modeled: worst-case key names (40 chars)
    // at the r15 value widths, two 12-row maps, three compact scale
    // blocks, plus the fixed fields — must fit the driver's ~2000-char
    // tail window with margin. This is a budget pin, not a golden
    // string: it fails if someone grows the compact line's shape past
    // the capture window again.
    val longKey = "x" * 40
    val map8 = (1 to 8).map(i => s""""$longKey$i":123.456""").mkString("{", ",", "}")
    val map10 = (1 to 10).map(i => s""""$longKey$i":123.456""").mkString("{", ",", "}")
    val block = s""","scale100_rel":{"wall":1234.5,"n":169,"med":1.39,"p90":2.37,"n_sup":1,"suspect":false,"data_changed":true}"""
    // ×5 blocks since r16: sf1x/sf10x/sf10xm + the two relational dirs
    val line = s"""{"metric":"total","value":120.183,"unit":"sec","queries":$map8,"n_queries":172,"n_errors":0,"load_avg_1m":3.690,"concurrent_suspect":false,"pool":8,"cpus":"32","heap_max_gb":48.0,"serial_full":$map10,"n_serial_suspect":0${block * 5},"data_fingerprint":"a0fefbd38515f0a8","sf":"/root/testdata/sf0.1","full":"bench_full_sf0.1.json"}"""
    assert(line.length < 1900, s"compact line budget blown: ${line.length} chars")
  }

  test("ScaleGen rel: counts scale, copies are key-disjoint, copy 0 is the source verbatim") {
    val spark = SparkTest.spark
    import org.apache.spark.sql.functions._
    val factor = 3
    val scaled = ScaleGen.scaleRelational(spark, SparkTest.sf, factor).toMap
    for ((t, df) <- scaled) {
      val srcN = Tables.table(spark, SparkTest.sf, t).count()
      assert(df.count() == factor * srcN, s"$t count != ${factor}x source")
    }
    // key disjointness: per-copy key images don't overlap — factor x
    // source distinct keys stay distinct after the shift
    val srcOrders = Tables.orders(spark, SparkTest.sf)
    assert(scaled("orders").select("o_orderkey").distinct.count() ==
      factor * srcOrders.select("o_orderkey").distinct.count())
    // copy 0 verbatim: the source rows are a strict subset (shift = 0)
    val maxOk = srcOrders.agg(max("o_orderkey")).head.getLong(0)
    assert(scaled("orders").filter(col("o_orderkey") <= maxOk)
      .exceptAll(srcOrders).isEmpty, "copy 0 of orders is not the source")
  }

  test("ScaleGen rel: every FK edge stays join-closed inside its copy") {
    val spark = SparkTest.spark
    val factor = 3
    val scaled = ScaleGen.scaleRelational(spark, SparkTest.sf, factor).toMap
    def orphans(fact: String, fk: String, dim: String, k: String): Long =
      scaled(fact).join(scaled(dim),
        scaled(fact)(fk) === scaled(dim)(k), "left_anti").count()
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    // and the join CARDINALITY scales exactly x factor: shifted FKs
    // land in exactly one copy's dimension image, never several
    val srcL = Tables.lineitem(spark, SparkTest.sf)
    val srcO = Tables.orders(spark, SparkTest.sf)
    val src = srcL.join(srcO, srcL("l_orderkey") === srcO("o_orderkey")).count()
    val big = scaled("lineitem").join(scaled("orders"),
      scaled("lineitem")("l_orderkey") === scaled("orders")("o_orderkey")).count()
    assert(big == factor * src, s"join cardinality $big != $factor x $src")
  }

  test("relationalKey partitions the query surface exactly as the rel-dir rotation list") {
    val rel = SparkEntry.queries.keys.filter(Bench.relationalKey).toSet
    // the 45 keys benched at sf1xr/sf10xr: 22 TPC-H flavors + 5 q_* +
    // 18 events keys; qdtree_* reads embeddings and must be excluded
    assert(rel.size == 45, s"expected 45 relational keys, got ${rel.size}: $rel")
    assert(rel.forall(k => k.startsWith("q") || k.startsWith("events_")))
    assert(!rel.exists(_.startsWith("qdtree")), "qdtree keys are embedding-family")
    assert(rel.contains("q_revenue_incremental") && rel.contains("events_sessionize"))
    assert(!rel.contains("dedup_exact") && !rel.contains("text_tokens"))
  }

  test("q21 plans ONE lineitem scan (window over bounded order groups, no self-joins)") {
    // the r6 plan shipped two extra 60M-row `others` shuffles (semi +
    // anti self-joins); the r16 window rewrite must keep them gone —
    // measured 42.8 s -> 14.2 s serial at the 100x relational dir
    val spark = SparkTest.spark
    val df = graft.operators.Analytics.q21WaitingSuppliers(spark, SparkTest.sf)
    val plan = df.queryExecution.executedPlan.toString
    val liScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(liScans == 1, s"expected exactly 1 lineitem scan, saw $liScans:\n$plan")
    assert(plan.contains("Window"), "expected the per-order window formulation")
  }

  test("ScaleGen rel: constant-cardinality aggregates scale exactly x factor") {
    val spark = SparkTest.spark
    import org.apache.spark.sql.functions._
    val factor = 3
    val scaled = ScaleGen.scaleRelational(spark, SparkTest.sf, factor).toMap
    val srcQ1 = Tables.lineitem(spark, SparkTest.sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val bigQ1 = scaled("lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(bigQ1.keySet == srcQ1.keySet, "group set changed under scaling")
    for ((g, (q, n)) <- srcQ1) {
      assert(bigQ1(g)._2 == factor * n, s"$g row count not x$factor")
      assert(math.abs(bigQ1(g)._1 - factor * q) < 1e-6 * math.abs(factor * q),
        s"$g sum(l_quantity) not x$factor")
    }
  }
}
