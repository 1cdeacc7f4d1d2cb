package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9 hardening: the bench artifact's load-aware serial fence
  * (round 8 shipped a 43×-wrong serial row taken at host load 8) and
  * the dataset fingerprint that makes testdata regeneration
  * mechanically detectable across rounds. Pure-JVM tests — no Spark.
  */
class Round9Spec extends AnyFunSuite {

  test("serial load threshold is cpus/4, floored for small dev hosts") {
    assert(Bench.loadThreshold(32) == 8.0)  // the driver's bench host
    assert(Bench.loadThreshold(16) == 4.0)
    // floor: a 4-cpu dev run must not quarantine every row at load 1.5
    assert(Bench.loadThreshold(4) == 2.0)
    assert(Bench.loadThreshold(1) == 2.0)
  }

  test("serial rows partition into clean vs suspect by end-of-query load") {
    val rows = Seq(
      ("q_clean", 1.0, 3.0, None),                    // under threshold
      ("q_edge", 2.0, 8.0, None),                     // AT threshold = clean
      ("q_loaded", 21.7, 14.5, None),                 // above = suspect
      ("q_failed", 0.1, 1.0, Some("boom")))           // error: in NEITHER
    val (clean, suspect) = Bench.partitionByLoad(rows, 8.0)
    assert(clean.map(_._1) == Seq("q_clean", "q_edge"))
    assert(suspect.map(_._1) == Seq("q_loaded"))
    // a failed row must never ship as a duration, clean OR suspect
    assert(!(clean ++ suspect).exists(_._1 == "q_failed"))
    // numbers ride along unchanged (suspect rows stay auditable)
    assert(suspect.head._2 == 21.7 && suspect.head._3 == 14.5)
  }

  test("data fingerprint is stable, and moves when any table changes") {
    val dir = java.nio.file.Files.createTempDirectory("fp_").toFile
    val f1 = new java.io.File(dir, "a.parquet")
    val f2 = new java.io.File(dir, "b.parquet")
    java.nio.file.Files.write(f1.toPath, "aaaa".getBytes)
    java.nio.file.Files.write(f2.toPath, "bb".getBytes)
    val fp0 = Bench.dataFingerprint(dir.toString)
    assert(fp0 == Bench.dataFingerprint(dir.toString), "must be deterministic")
    assert(fp0.matches("[0-9a-f]{16}"))
    // size change → new fingerprint (a regenerated table re-draws sizes)
    java.nio.file.Files.write(f2.toPath, "bbbbbb".getBytes)
    val fp1 = Bench.dataFingerprint(dir.toString)
    assert(fp1 != fp0, "size change must move the fingerprint")
    // mtime-only change (same size) → new fingerprint too
    f1.setLastModified(f1.lastModified + 60000)
    assert(Bench.dataFingerprint(dir.toString) != fp1,
      "mtime change must move the fingerprint")
  }
}
