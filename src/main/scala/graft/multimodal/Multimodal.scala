package graft.multimodal

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.F).
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns
  * with typed metadata, decoded per-batch by vectorized UDFs. The media
  * codecs are NOT in this container, so the decode kernel is a
  * clearly-marked deterministic stand-in — but everything Spark-level is
  * real and load-bearing: the binary column, the typed schema, the
  * mapPartitions batching (one decoder init per partition, NOT per row
  * — the at-scale shape), and the frame-sampling plan.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, width: Int, height: Int, mean_intensity: Double)

  /** The media table: binary payloads derived deterministically from the
    * documents table (stand-in for a real blob column).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** STUB decode kernel: a real build replaces this body with the codec
    * call (e.g. libjpeg / ffmpeg via JNI). Shape, determinism, and
    * per-partition init cost model are what the pipeline tests.
    */
  private def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Double) = {
    // ??? <- real codec goes here; deterministic fake below
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = 16 + math.floorMod(h, 16).toInt
    val ht = 16 + math.floorMod(h >> 8, 16).toInt
    val mean = math.floorMod(h >> 16, 256).toDouble / 255.0
    (w, ht, mean)
  }

  /** F1: binary → typed feature extraction via mapPartitions (decoder
    * initialized once per partition; rows stream through in one pass).
    */
  def features(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition decoder init happens HERE (once), not per row
      rows.map { r =>
        val (w, h, mean) = decodeStub(r.kind, r.payload)
        var c = 0L
        var i = 0
        while (i < r.payload.length) { c = (c * 131 + r.payload(i)) & 0xffffffffL; i += 1 }
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, c, w, h,
          math.rint(mean * 10000) / 10000)
      }
    }
  }

  /** F3: resize plan for image rows — aspect-preserving fit into a
    * target box, computed from the decoded dimensions. Pure column math
    * over the feature table (the actual pixel resample happens in the
    * stubbed codec); emits the (scale, out_w, out_h) every image
    * pipeline needs before batching into a model.
    */
  def resizePlan(spark: SparkSession, dir: String,
                 targetW: Int = 224, targetH: Int = 224): DataFrame = {
    import org.apache.spark.sql.functions._
    features(spark, dir).toDF()
      .filter(col("kind") === "image")
      .withColumn("scale", round(
        least(lit(targetW.toDouble) / col("width"), lit(targetH.toDouble) / col("height")), 4))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
      .select("media_id", "width", "height", "scale", "out_w", "out_h")
      .orderBy("media_id")
  }

  /** F2: deterministic frame-index sampling plan for video rows — pure
    * column math (codegen), no decode: every ~`stride`th frame index up
    * to a per-row pseudo frame count.
    */
  def frameSamplePlan(spark: SparkSession, dir: String, stride: Int = 10): DataFrame =
    mediaTable(spark, dir).toDF()
      .filter(col("kind") === "video")
      .withColumn("n_frames", (length(col("payload")) % 100 + 30).cast("int"))
      .select(col("media_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")
      .orderBy("media_id", "sample_idx")
}
