package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Round-17 optimization invariants: every restructure this round must
  * be result-invisible — these specs pin the dispatch/rewrite branches
  * equal where the oracle alone can't exercise both sides.
  */
class Round17Spec extends AnyFunSuite {
  import SparkTest._

  test("exact-quantile distributed rank equals the single-task window rank (E8/E41 dispatch)") {
    // the dispatch threshold (~40M rows) never fires at the test SFs —
    // force the distributed branch and pin it row-identical to the
    // default plan on both consumers' quantile grids
    for (grid <- Seq(
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99),
        Seq("q1" -> 0.25, "q3" -> 0.75))) {
      val cols = "event_type" +: grid.map(_._1)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.head, cols.tail: _*)
          .collect().map(_.toSeq.map(v => Option(v))).toSet
      val single = rows(Analytics.typeQuantilesForTest(spark, sf, grid))
      val dist = rows(Analytics.typeQuantilesDistributed(spark, sf, grid))
      assert(single == dist, s"rank dispatch diverges on grid $grid")
    }
  }

  test("cost-model layout distributed benefit rank equals the single-window form (A17)") {
    import graft.rbac.{Partitioned, Rbac}
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    val single = rows(Partitioned.buildCostModelLayoutFrom(
      spark, sf, Rbac.userRoles(spark, sf), 2.0, 20))
    val dist = rows(Partitioned.buildCostModelLayoutFrom(
      spark, sf, Rbac.userRoles(spark, sf), 2.0, 20, rankSinglePartMax = 0L))
    assert(single == dist, "benefit-rank dispatch diverges")
  }

  test("events_quantiles result is unchanged by the rank-dispatch refactor") {
    val got = Analytics.valueQuantiles(spark, sf).collect()
    assert(got.length > 0)
    // every per-type row must carry non-decreasing quantiles
    got.filter(r => !r.isNullAt(1)).foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3),
        s"non-monotone quantiles in $r")
    }
  }
}
