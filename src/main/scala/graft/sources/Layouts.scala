package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.vector._
import graft.rbac.Rbac

/** Materialized physical layouts — the write-side of the reference's
  * partition tables (controller/baseline/prefilter/initialize_partitions
  * .py creates `documentblocks_role_%` TABLES; the Spark-native
  * equivalent is PARTITIONED PARQUET, where query-time routing becomes
  * file pruning the scan never reads past).
  *
  * `materializeRoleLayout` writes blocks duplicated per granting role,
  * `partitionBy("partition_role")`; `prunedRoleSearch` reads it back
  * with a partition predicate — `PartitionFilters` in the scan node (see
  * LayoutSpec) proves only the user's role directories are touched. At
  * 100 TB this is the difference between scanning ~2 role partitions
  * and scanning everything.
  */
object Layouts {

  /** Write the role-partitioned layout; returns the layout path. */
  def materializeRoleLayout(spark: SparkSession, dir: String, outDir: String): String =
    materializeRoleLayoutFrom(spark, dir, Rbac.blocks(spark, dir), outDir)

  /** Same, from an explicit block set (lets tests hold out an "insert"
    * batch to compact in later).
    */
  def materializeRoleLayoutFrom(spark: SparkSession, dir: String,
                                blocks: DataFrame, outDir: String): String = {
    val path = s"$outDir/blocks_by_role"
    if (!Files.exists(Paths.get(path))) {
      blocks
        .join(Rbac.permissions(spark, dir), "document_id")
        .select(col("role_id").as("partition_role"), col("block_id"),
          col("document_id"), col("embedding"))
        .repartition(col("partition_role")) // one writer per partition dir
        .write.partitionBy("partition_role").mode("overwrite").parquet(path)
    }
    path
  }

  /** Incremental layout maintenance — the batch half of the insertion
    * story (reference: hnsw/insertion.py routes new blocks into
    * existing partitions and updates their indexes; G3/VectorStream is
    * the arrival half). Merges a batch of inserted blocks into the
    * materialized role layout:
    *   - each insert is routed to the partitions of its granting roles
    *     (same duplication rule the original build used);
    *   - an anti-join against the layout's existing (partition, block)
    *     keys makes the job IDEMPOTENT — re-running the same batch
    *     appends nothing;
    *   - only affected partition directories receive files (append of
    *     the delta — at 100 TB you periodically rewrite a partition
    *     when its delta-file count grows, which is this same job with
    *     an overwrite of that partition).
    * Search over the compacted layout needs no special handling:
    * `prunedRoleSearch` already dedups blocks per partition.
    */
  def compactInserts(spark: SparkSession, dir: String, layoutPath: String,
                     inserts: DataFrame): Unit = {
    val routed = inserts
      .join(Rbac.permissions(spark, dir), "document_id")
      .select(col("role_id").as("partition_role"), col("block_id"),
        col("document_id"), col("embedding"))
    val existing = spark.read.parquet(layoutPath)
      .select("partition_role", "block_id")
    routed
      .join(existing, Seq("partition_role", "block_id"), "left_anti") // idempotent
      .repartition(col("partition_role"))
      .write.partitionBy("partition_role").mode("append").parquet(layoutPath)
  }

  /** Partition rewrite — the maintenance sweep `compactInserts` defers
    * to (reference: hnsw/helper.py reorganize_partitions /
    * clean_empty_partitions): once a partition directory accumulates
    * delta files from appended insert batches, rewrite JUST that
    * partition into one compacted file (dynamic partition overwrite —
    * sibling partitions untouched). Returns (files_before,
    * files_after). Idempotent; search results unchanged.
    */
  def rewritePartition(spark: SparkSession, layoutPath: String, role: Long): (Int, Int) = {
    val partDir = Paths.get(layoutPath, s"partition_role=$role")
    def fileCount: Int =
      if (!Files.exists(partDir)) 0
      else {
        val s = Files.list(partDir)
        try s.filter(_.toString.endsWith(".parquet")).count().toInt finally s.close()
      }
    val before = fileCount
    // distributed rewrite into a staging dir, then a directory swap —
    // no driver-side collect; the swap is the file-level analogue of a
    // table format's atomic metadata commit
    val staging = Paths.get(layoutPath + s"_rewrite_$role")
    spark.read.parquet(layoutPath)
      .filter(col("partition_role") === role) // partition pruning: one dir read
      .drop("partition_role")
      .coalesce(1)
      .write.mode("overwrite").parquet(staging.toString)
    val olds = Files.list(partDir)
    try olds.forEach(p => Files.delete(p)) finally olds.close()
    val news = Files.list(staging)
    try news.filter(p => !p.getFileName.toString.startsWith("_"))
      .forEach(p => Files.move(p, partDir.resolve(p.getFileName)))
    finally news.close()
    val rest = Files.walk(staging).sorted(java.util.Comparator.reverseOrder())
    try rest.forEach(p => Files.delete(p)) finally rest.close()
    (before, fileCount)
  }

  /** Top-k over the materialized layout: the role predicate is a
    * PARTITION filter (directory pruning), not a row filter.
    */
  def prunedRoleSearch(spark: SparkSession, dir: String, layoutPath: String,
                       userId: Long, k: Int): DataFrame = {
    val roleIds = Rbac.userRoles(spark, dir)
      .filter(col("user_id") === userId)
      .collect().map(_.getLong(1)) // tiny: the user's 1-2 roles
    spark.read.parquet(layoutPath)
      .filter(col("partition_role").isin(roleIds: _*)) // partition pruning
      .crossJoin(broadcast(Rbac.queryVector(spark, dir)))
      .withColumn("dist", l2_dist(col("embedding"), col("qvec")))
      // dedup blocks duplicated across role partitions on slim columns
      // (distance is identical per block), not on the embedding array
      .groupBy("block_id", "document_id")
      .agg(min("dist").as("dist"))
      .orderBy(col("dist"), col("block_id"))
      .limit(k)
      .select("block_id", "document_id")
  }
}
