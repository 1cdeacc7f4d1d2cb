package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.vector._

/** Cost-model calibration (`sbt "runMain graft.Calibrate"`) — the
  * analogue of the reference's parameter fitting
  * (controller/dynamic_partition/get_parameter.py measures per-phase
  * query times against live partitions and fits the a/b constants of
  * `compute_query_time`). Here: time a permission-style top-k over
  * partitions of varying size, then least-squares fit both cost shapes
  *   linear  t ≈ a·n + b      (scan engine: work ∝ rows scanned)
  *   log     t ≈ a·ln(n) + b  (the reference's HNSW traversal shape)
  * and print fitted constants + R². The fitted `b` is the fixed
  * per-query overhead — the term that dominates at toy SF and washes
  * out at cluster scale; `a` is what the partitioner's benefit ranking
  * actually trades against duplicated storage. Results recorded in
  * CALIBRATION.md per round.
  */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val blocks = graft.rbac.Rbac.blocks(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism).persist()
    val n0 = blocks.count()
    // a FIXED query batch (the whole corpus as queries) makes per-row
    // work Q·dim flops — large enough that the size-dependent term
    // rises above the fixed driver overhead even at toy SF
    val queries = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    def timeTopK(n: Long): Double = {
      val reps = 5
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // count() alone would let Catalyst prune the aggregate (and the
        // distance kernel with it) — consume the ids so the work is real
        blocks.filter(col("block_id") < n)
          .crossJoin(broadcast(queries))
          .groupBy("query_id")
          .agg(graft.operators.TopKAgg.topk_ids(
            l2_dist(col("embedding"), col("qvec")), col("block_id"), 10).as("ids"))
          .select(explode(col("ids"))).count()
        (System.nanoTime() - t0) / 1e6
      }
      times.sorted.apply(reps / 2) // median ms
    }

    timeTopK(n0); timeTopK(n0) // warm JVM + codegen, untimed

    val fractions = Seq(0.0625, 0.125, 0.25, 0.5, 1.0)
    val points = fractions.map { f =>
      val n = math.max((n0 * f).toLong, 16L)
      (n, timeTopK(n))
    }

    def fit(xs: Seq[Double], ys: Seq[Double]): (Double, Double, Double) = {
      val nn = xs.length
      val (mx, my) = (xs.sum / nn, ys.sum / nn)
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val a = sxy / sxx
      val b = my - a * mx
      val ssRes = xs.zip(ys).map { case (x, y) => math.pow(y - (a * x + b), 2) }.sum
      val ssTot = ys.map(y => math.pow(y - my, 2)).sum
      (a, b, if (ssTot == 0) 1.0 else 1.0 - ssRes / ssTot)
    }

    val ys = points.map(_._2)
    val (la, lb, lr2) = fit(points.map(_._1.toDouble), ys)
    val (ga, gb, gr2) = fit(points.map(p => math.log(p._1.toDouble)), ys)
    val pts = points.map { case (n, t) => s"""{"n":$n,"ms":${math.round(t * 100) / 100.0}}""" }
      .mkString("[", ",", "]")
    println(f"""{"points":$pts,"linear":{"a_ms_per_row":$la%.6f,"b_ms":$lb%.2f,"r2":$lr2%.4f},"log":{"a_ms":$ga%.2f,"b_ms":$gb%.2f,"r2":$gr2%.4f},"sf":"$sfDir"}""")
    spark.stop()
  }
}
