package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.{Ann, GraphSearch}

/** Round-14 pins — A21's partitioned serving path promoted to policy
  * grade (VERDICT r13 #1).
  *
  *  1. the per-partition serve policy is PINNED below the exact-build
  *     ceiling: every oracle SF serves the shipped (iters=2, ef=Ef)
  *     default unprobed, so A21's replay CTEs stay valid verbatim and
  *     Verify never pays probe walks. The policy only engages where
  *     the quadratic exact build is out of contract anyway.
  *  2. the policy default's OUTPUT is identical to the r13 shipped
  *     behavior at the oracle SF — the dispatch is a scale path, not a
  *     semantics change.
  *  3. the rank remap the subset descent/nav machinery rides on is a
  *     dense, order-preserving [0, m) bijection (the hash long-link
  *     modulus is uniform only over a contiguous space).
  *  4. the subset descent build stays inside its member set and is
  *     deterministic (the whole serving graph must be a constant of
  *     (data, code) for the session caches and any future sidecar
  *     replay to be sound).
  */
class Round14Spec extends AnyFunSuite {
  import SparkTest._

  test("partitionServePolicy is pinned to the shipped default below the exact ceiling") {
    for (u <- GraphSearch.SweepUsers) {
      val m = GraphSearch.partitionMemberCount(spark, sf, u)
      assert(m <= Ann.KnnExactMaxN,
        s"oracle-SF sweep user $u routed $m members — above the exact ceiling, " +
          "the pin below no longer covers the oracle regime")
      val (iters, ef, recall) = GraphSearch.partitionServePolicy(spark, sf, u)
      assert(iters == 2 && ef == GraphSearch.Ef,
        s"policy probed/escalated at the oracle SF for user $u: (iters=$iters, ef=$ef)")
      assert(recall == -1.0, "pinned policy must be unprobed (recall sentinel -1)")
    }
  }

  test("policy-default A21 output equals the explicit shipped-ef walk at the oracle SF") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val policy = rows(GraphSearch.partitionGraphTopK(spark, sf, 1))
    val pinned = rows(GraphSearch.partitionGraphTopK(spark, sf, 1, ef = GraphSearch.Ef))
    assert(policy == pinned, "ef=-1 (policy) changed oracle-SF serving output")
  }

  test("A22: policy serving key is pinned and permission-clean at the oracle SF") {
    // below the exact ceiling the policy pin means A22 walks the SAME
    // graph at the SAME (iters=2, ef=Ef) as A21 — the key adds the
    // batch width and the sidecar replay, not new oracle-SF semantics
    val out = GraphSearch.partitionGraphPolicyTopK(spark, sf, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty, "policy serving returned no rows")
    val acc = graft.rbac.Rbac.accessibleDocs(spark, sf, 1)
      .select("document_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => acc(r._2)),
      "A22 served a document outside user 1's accessible set")
    val perQuery = out.groupBy(_._1).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 10), "A22 served more than k per query")
  }

  test("denseRanks is a dense order-preserving bijection over the subset") {
    val members = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(3)) === 1)
      .select("vec_id")
    val ranked = Ann.denseRanks(spark, members)
    val got = ranked.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val ids = members.collect().map(_.getLong(0)).sorted
    assert(got.map(_._1).toSeq == ids.toSeq, "rank frame lost/invented members")
    assert(got.map(_._2).toSeq == ids.indices.map(_.toLong),
      "ranks are not the dense vec_id-order assignment")
    ranked.unpersist()
  }

  test("subset descent build stays in its member set and is deterministic") {
    val members = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(2)) === 0)
      .select("vec_id")
    val ids = members.collect().map(_.getLong(0)).toSet
    def build(): Set[(Long, Long)] = {
      val ranked = Ann.denseRanks(spark, members)
      val g = Ann.knnGraphDescentOnRanked(spark, sf, ranked, ids.size.toLong,
        GraphSearch.GraphK)
      val e = g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ranked.unpersist()
      e
    }
    val a = build()
    assert(a.nonEmpty)
    assert(a.forall { case (s, n) => ids(s) && ids(n) },
      "descent edge escaped the member subset")
    assert(a.map(_._1).size > ids.size / 2,
      "descent graph covers too few members to serve from")
    assert(a == build(), "subset descent differed between two builds")
  }
}
