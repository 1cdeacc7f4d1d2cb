package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.Tables

/** Multimodal-column pipeline (SURVEY.md §2.F).
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns
  * with typed metadata, decoded per-batch inside the executors. Here
  * BOTH halves are real:
  *   - payloads are REAL uncompressed formats, synthesized
  *     deterministically from the documents table (no blob store in the
  *     container): binary PGM (P5) images, RIFF/WAVE 8-bit PCM audio,
  *     and a length-prefixed raw-frame video container;
  *   - the decode kernels are REAL format parsers — magic/header
  *     validation, dimension extraction, and a pixel/sample scan — not
  *     hash stand-ins.
  * What a production build would still swap in is COMPRESSED codec
  * support (libjpeg/ffmpeg via JNI) — the decoder interface, the
  * per-partition batching (one decoder init per partition, not per
  * row), and the typed feature schema are exactly what those libraries
  * plug into.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           checksum: Long, width: Int, height: Int, mean_intensity: Double)

  // --- payload synthesis (real formats, deterministic content) ---

  private def pixels(seed: Array[Byte], n: Int): Array[Byte] = {
    // empty text must still yield a valid payload, not a / by zero
    val s = if (seed.isEmpty) Array[Byte](0) else seed
    Array.tabulate(n)(i => (s(i % s.length) * 31 + i).toByte)
  }

  /** Binary PGM (netpbm P5): ASCII header `P5\n<w> <h>\n255\n` + w·h
    * gray bytes.
    */
  private def synthPgm(docId: Long, seed: Array[Byte]): Array[Byte] = {
    val w = 16 + (docId % 16).toInt
    val h = 16 + ((docId / 16) % 16).toInt
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ pixels(seed, w * h)
  }

  /** RIFF/WAVE, PCM (format 1), mono, 8 kHz, 8-bit unsigned samples —
    * the canonical 44-byte header + data chunk.
    */
  private def synthWav(docId: Long, seed: Array[Byte]): Array[Byte] = {
    val n = 256 + (docId % 512).toInt
    val bb = ByteBuffer.allocate(44 + n).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    bb.put(pixels(seed, n))
    bb.array()
  }

  /** Raw-frame video container `GFV0 | u16 n_frames | u16 w | u16 h |
    * n_frames·w·h gray bytes` (big-endian) — the uncompressed analogue
    * of a fourcc'd AVI stream; frame count is IN THE HEADER, which is
    * what makes header-only column parsing (frameSamplePlan) honest.
    */
  private def synthVideo(docId: Long, seed: Array[Byte]): Array[Byte] = {
    val (w, h) = (16, 16)
    val nf = 30 + (docId % 100).toInt
    val bb = ByteBuffer.allocate(10 + nf * w * h).order(ByteOrder.BIG_ENDIAN)
    bb.put("GFV0".getBytes("US-ASCII"))
      .putShort(nf.toShort).putShort(w.toShort).putShort(h.toShort)
    bb.put(pixels(seed, nf * w * h))
    bb.array()
  }

  /** The media table: real-format binary payloads, one per document. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (docId, text) =>
        val seed = text.getBytes("UTF-8")
        val kind = docId % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload = kind match {
          case "image" => synthPgm(docId, seed)
          case "audio" => synthWav(docId, seed)
          case _       => synthVideo(docId, seed)
        }
        MediaRow(docId, kind, payload)
      }
  }

  // --- decode kernels (real parsers) ---

  /** Parse binary PGM: validate magic, read ASCII dims/maxval, mean
    * gray over the pixel plane.
    */
  private def decodePgm(p: Array[Byte]): (Int, Int, Double) = {
    require(p.length > 2 && p(0) == 'P' && p(1) == '5', "not a P5 PGM")
    var i = 2
    def token(): Int = {
      while (i < p.length && p(i).toChar.isWhitespace) i += 1
      var v = 0
      while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); i += 1 }
      v
    }
    val w = token(); val h = token(); val maxv = token()
    i += 1 // single whitespace after maxval per spec
    require(w > 0 && h > 0 && maxv > 0 && p.length - i >= w * h, "truncated PGM")
    var s = 0L; var j = i
    while (j < i + w * h) { s += p(j) & 0xff; j += 1 }
    (w, h, s.toDouble / (w.toLong * h) / maxv)
  }

  /** Parse RIFF/WAVE: validate chunk ids + PCM format, mean normalized
    * deviation from the 8-bit midpoint over the data chunk. Returns
    * (n_samples, 1, mean) — audio "width" is its sample count.
    */
  private def decodeWav(p: Array[Byte]): (Int, Int, Double) = {
    val bb = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int): String = new String(p, at, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a RIFF/WAVE")
    require(fourcc(12) == "fmt " && bb.getShort(20) == 1, "not PCM")
    val bitsPerSample = bb.getShort(34)
    require(fourcc(36) == "data", "missing data chunk")
    val n = bb.getInt(40)
    require(bitsPerSample == 8 && p.length >= 44 + n, "truncated WAV")
    var s = 0L; var j = 44
    while (j < 44 + n) { s += math.abs((p(j) & 0xff) - 128); j += 1 }
    // /128 keeps the mean in [0,1] (|sample−128| reaches 128); an empty
    // data chunk is structurally valid → silence, not NaN
    (n, 1, if (n == 0) 0.0 else s.toDouble / n / 128.0)
  }

  /** Parse the GFV0 container: validate magic, read frame geometry,
    * mean gray over ALL frames.
    */
  private def decodeVideo(p: Array[Byte]): (Int, Int, Double) = {
    val bb = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    require(new String(p, 0, 4, "US-ASCII") == "GFV0", "not a GFV0 stream")
    val nf = bb.getShort(4) & 0xffff
    val w = bb.getShort(6) & 0xffff
    val h = bb.getShort(8) & 0xffff
    require(p.length >= 10 + nf * w * h, "truncated GFV0")
    var s = 0L; var j = 10
    while (j < 10 + nf * w * h) { s += p(j) & 0xff; j += 1 }
    (w, h, s.toDouble / (nf.toLong * w * h) / 255.0)
  }

  /** F1: binary → typed feature extraction via mapPartitions (decoder
    * dispatch initialized once per partition; rows stream through in
    * one pass). The parsers above are the "codec"; a compressed-format
    * build swaps them for JNI calls behind the same (Int, Int, Double)
    * interface.
    */
  def features(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      // per-partition decoder init happens HERE (once), not per row
      val decode: (String, Array[Byte]) => (Int, Int, Double) = {
        case ("image", p) => decodePgm(p)
        case ("audio", p) => decodeWav(p)
        case (_, p)       => decodeVideo(p)
      }
      rows.map { r =>
        val (w, h, mean) = decode(r.kind, r.payload)
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
    * over the feature table; emits the (scale, out_w, out_h) every
    * image pipeline needs before batching into a model.
    */
  def resizePlan(spark: SparkSession, dir: String,
                 targetW: Int = 224, targetH: Int = 224): DataFrame = {
    features(spark, dir).toDF()
      .filter(col("kind") === "image")
      .withColumn("scale", round(
        least(lit(targetW.toDouble) / col("width"), lit(targetH.toDouble) / col("height")), 4))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
      .select("media_id", "width", "height", "scale", "out_w", "out_h")
      .orderBy("media_id")
  }

  /** F2: frame-index sampling plan for video rows — every `stride`th
    * frame up to the REAL frame count, parsed from the GFV0 header with
    * column functions only (bytes 5–6, big-endian u16): header-only
    * metadata extraction, no frame decode, fully codegen.
    */
  def frameSamplePlan(spark: SparkSession, dir: String, stride: Int = 10): DataFrame =
    mediaTable(spark, dir).toDF()
      .filter(col("kind") === "video")
      .withColumn("n_frames",
        expr("CAST(conv(hex(substring(payload, 5, 2)), 16, 10) AS INT)"))
      .select(col("media_id"), col("n_frames"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .withColumnRenamed("pos", "sample_idx")
      .withColumnRenamed("col", "frame_idx")
      .orderBy("media_id", "sample_idx")
}
