package graft.ann

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.vector._
import graft.rbac.Rbac

/** Grouped k-means — k-means for MANY groups in ONE distributed job
  * (reference: build_role_indexes.py / build_dynamic_partition_indexes
  * .py build a separate IVFFlat index PER partition table by looping
  * partitions on the controller; the Spark-first re-expression runs
  * every partition's clustering in the same DataFrame passes, no
  * per-partition driver loop, no per-partition MLlib fit):
  *
  *   - seeds: the k rows with the smallest deterministic hash per
  *     group (a per-group window top-k, one shuffle);
  *   - assign: points ⋈ current centroids ON group (the centroid frame
  *     is groups×k rows — broadcast), `min_by` argmin over the k
  *     candidates per point;
  *   - update: element-wise centroid mean via posexplode →
  *     (group, cid, dim) partial-agg'd averages → array reassembly
  *     (the exploded shuffle carries groups×k×dim tiny rows).
  *
  * Each Lloyd iteration is three shuffles TOTAL across all groups
  * (argmin assignment, dim-wise partial mean, array reassembly — the
  * latter two carrying only groups×k×dim rows) — the per-partition
  * loop the reference runs becomes data parallelism. A cluster left
  * empty by an update keeps its previous centroid (k centroids per
  * group always survive, and Lloyd's SSE monotonicity is preserved).
  */
object GroupedKMeans {

  /** points: (group: long, id: long, vec: array<float>) →
    * centroids (group, cid, centroid: array<float>).
    */
  def fit(points: DataFrame, k: Int, iters: Int): DataFrame = {
    val seedW = Window.partitionBy("group")
      .orderBy(pmod(col("id") * lit(2654435761L % 1000003L), lit(1000000007L)), col("id"))
    var cents = points
      .withColumn("__rn", row_number().over(seedW))
      .filter(col("__rn") <= k)
      .select(col("group"), (col("__rn") - 1).cast("int").as("cid"),
        col("vec").as("centroid"))
    var it = 0
    while (it < iters) {
      val assigned = assign(points, cents)
      val updated = assigned
        .select(col("group"), col("cid"), posexplode(col("vec")).as(Seq("dim", "v")))
        .groupBy("group", "cid", "dim").agg(avg("v").as("m"))
        .groupBy("group", "cid")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("group"), col("cid"),
          expr("transform(dm, x -> cast(x.m AS float))").as("new_centroid"))
      // empty-cluster handling: a cid that received no points keeps its
      // previous centroid — otherwise it would silently vanish from the
      // groupBy and the group would fall below k
      cents = cents.join(updated, Seq("group", "cid"), "left_outer")
        .select(col("group"), col("cid"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
      it += 1
    }
    cents
  }

  /** Nearest-centroid assignment: (group, id, vec, cid, dist). The
    * argmin is min of (dist, cid) — smallest cid wins exact ties, the
    * same deterministic rule the NearestCentroid kernel uses.
    */
  def assign(points: DataFrame, cents: DataFrame): DataFrame =
    points.join(broadcast(cents), Seq("group")) // groups×k rows — always broadcast-sized
      .withColumn("d", l2_dist(col("vec"), col("centroid")))
      .groupBy("group", "id")
      .agg(min(struct(col("d"), col("cid"))).as("best"),
        first("vec").as("vec"))
      .select(col("group"), col("id"), col("best.cid").as("cid"),
        col("best.d").as("dist"), col("vec"))

  /** Mean within-cluster squared distance per group — the convergence
    * observable (must not increase over Lloyd iterations).
    */
  def sse(points: DataFrame, cents: DataFrame): DataFrame =
    assign(points, cents)
      .groupBy("group").agg(avg(col("dist") * col("dist")).as("mse"))

  /** B21 query surface: per-role mini-IVF build report over the RBAC
    * layout — every role partition's index built in one job
    * (role, cell, n_vectors). Rows-only: seeded-float k-means isn't
    * SQL-replayable, GroupedKMeansSpec asserts SSE decrease and
    * coverage instead.
    */
  def partitionIndexBuild(spark: SparkSession, dir: String,
                          k: Int = 4, iters: Int = 2): DataFrame = {
    // the fit is run EAGERLY over a build-scoped cache and its (tiny)
    // centroid frame collected: the returned report plan then scans the
    // corpus exactly once, and nothing stays pinned in the session
    val points = rolePoints(spark, dir)
    points.persist()
    val centRows = try fit(points, k, iters).collect().toIndexedSeq
      finally points.unpersist()
    import org.apache.spark.sql.types._
    val centSchema = StructType(Seq(
      StructField("group", LongType), StructField("cid", IntegerType),
      StructField("centroid", ArrayType(FloatType))))
    val cents = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows, 1), centSchema)
    assign(rolePoints(spark, dir), cents)
      .groupBy(col("group").as("partition_role"), col("cid").as("cell"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy("partition_role", "cell")
  }

  /** (group=role, id=block, vec) — the role-partitioned corpus. */
  private[graft] def rolePoints(spark: SparkSession, dir: String): DataFrame =
    Rbac.blocks(spark, dir)
      .join(Rbac.permissions(spark, dir), "document_id")
      .select(col("role_id").as("group"), col("block_id").as("id"),
        col("embedding").as("vec"))
}
