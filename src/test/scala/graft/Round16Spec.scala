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

  test("compact tail line budget: 12-row maps + compact scale blocks fit a 2000-char capture") {
    // the r15 regression, re-modeled: worst-case key names (40 chars)
    // at the r15 value widths, two 12-row maps, three compact scale
    // blocks, plus the fixed fields — must fit the driver's ~2000-char
    // tail window with margin. This is a budget pin, not a golden
    // string: it fails if someone grows the compact line's shape past
    // the capture window again.
    val longKey = "x" * 40
    val map12 = (1 to 12).map(i => s""""$longKey$i":123.456""").mkString("{", ",", "}")
    val block = s""","scaleZZZ":{"wall":1234.5,"n":169,"med":1.39,"p90":2.37,"n_sup":1,"suspect":false,"data_changed":true}"""
    val line = s"""{"metric":"total","value":120.183,"unit":"sec","queries":$map12,"n_queries":172,"n_errors":0,"load_avg_1m":3.690,"concurrent_suspect":false,"pool":8,"cpus":"32","heap_max_gb":48.0,"serial_full":$map12,"n_serial_suspect":0${block * 3},"data_fingerprint":"a0fefbd38515f0a8","sf":"/root/testdata/sf0.1","full":"bench_full_sf0.1.json"}"""
    assert(line.length < 1900, s"compact line budget blown: ${line.length} chars")
  }
}
