package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.IvfIndex

/** Round-13 pins.
  *
  *  1. the k-means fit is PARTITION-LAYOUT-INDEPENDENT (VERDICT r12
  *     #3): `fitCentroids` returns bit-identical centroids no matter
  *     how the input frame is partitioned or ordered. Layout
  *     independence is the exact invariant MLlib's seeded fit lacked
  *     (its "random" init samples by partition), and it is what makes
  *     the fit reproduce across fresh JVMs — a JVM can only influence
  *     the fit through the physical layout, which this pins away.
  *     Both nondeterminism sources are exercised: seed sampling
  *     (different partition counts) and mean reduction order
  *     (quantized-long sums are order-exact; double sums would
  *     drift across layouts).
  *  2. the fit is consumed coherently: the session caches hand every
  *     consumer (assignment frame, radii, sidecars) centroids from
  *     ONE fit, so the layout-independence above makes the per-cell
  *     histogram — the quantity C5's cost hangs off — a constant of
  *     (data, code).
  */
class Round13Spec extends AnyFunSuite {
  import SparkTest._

  test("fitCentroids is identical across partition layouts and row orders") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("features"))
    val k = 16
    val a = IvfIndex.fitCentroids(base.repartition(3), k)
    val b = IvfIndex.fitCentroids(base.repartition(13), k)
    val c = IvfIndex.fitCentroids(
      base.orderBy(col("vec_id").desc).coalesce(1), k)
    def flat(x: Array[Array[Float]]): Seq[Float] = x.flatten.toSeq
    assert(flat(a) == flat(b),
      "fit differed between 3-partition and 13-partition layouts")
    assert(flat(a) == flat(c),
      "fit differed under reversed single-partition input")
  }

  test("nndServePolicy picks iters=2 at the oracle SF and meets the target") {
    import graft.ann.GraphSearch
    val (iters, ef, recall) = GraphSearch.nndServePolicy(spark, sf)
    // oracle-SF pin (VERDICT r12 #1 done-criterion): the policy must
    // leave every oracle SF on the iters=2 graph, so the existing B39
    // oracles and the nnd_graph_k8 sidecar replay stay untouched
    assert(iters == 2, s"policy escalated iters at the oracle SF: $iters")
    assert(recall >= GraphSearch.RecallTarget,
      s"policy pick (iters=$iters, ef=$ef) measured $recall below target")
    // the model key must still run and return the full batch
    assert(GraphSearch.graphTopKNndModel(spark, sf).count() > 0)
  }

  test("navigable serving graph contains every base serving edge plus long links") {
    import graft.ann.GraphSearch
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = edges(GraphSearch.nndServingGraph(spark, sf))
    val nav = edges(GraphSearch.nndNavServingGraph(spark, sf))
    // the nav graph only ADDS reachability: short links are untouched
    assert(base.subsetOf(nav))
    val extra = nav -- base
    assert(extra.nonEmpty, "no long links were added")
    // long links are symmetric by construction
    assert(extra.forall { case (a, b) => nav((b, a)) })
  }

  test("cell histogram is a constant of (data, code) across layouts") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").as("features"))
    def hist(parts: Int): Map[Int, Long] = {
      val cents = IvfIndex.fitCentroids(base.repartition(parts), 8)
      Tables.embeddings(spark, sf)
        .select(graft.functions.vector.nearest_centroid(
          col("embedding"), cents).as("cell"))
        .groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    assert(hist(2) == hist(11))
  }
}
