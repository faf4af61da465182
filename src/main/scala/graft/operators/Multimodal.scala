package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs batched per partition so a real
  * decoder amortizes model/codec setup per batch, not per row — the
  * Spark-side shape (schema, encoders, partition batching, feature
  * vector output) is the real contract.
  *
  * IMAGE DECODE IS REAL: `image`-kind payloads go through
  * `javax.imageio` (pure-JVM PNG/JPEG/GIF/BMP codecs) — true
  * dimensions plus a normalized luminance histogram as the feature
  * vector. Audio/video codecs don't exist in a bare JVM, so those
  * modalities (and undecodable image bytes) fall back to the
  * deterministic `decodeStub`, keeping the operator total.
  */
object Multimodal {

  /** One media row: id, modality kind, raw bytes, string metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      meta: Map[String, String])

  /** Decoded feature row. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  /** The on-disk schema for a media table. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Rows per decode batch — sized for a typical accelerator/codec
    * batch, tunable by the caller.
    */
  val defaultBatchSize = 64

  /** Real image decode (javax.imageio): true width/height and a
    * `dim`-bin normalized luminance histogram (Rec. 601 weights over
    * 0..255, bins sum to 1) — a genuine, assertable feature vector.
    * Returns None when the bytes aren't a decodable image, so callers
    * can fall back without exceptions on a 100 TB corpus of
    * occasionally-corrupt payloads.
    */
  private[operators] def decodeImage(payload: Array[Byte],
      dim: Int): Option[(Int, Int, Array[Float])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Float](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            val bin = math.min(dim - 1, (lum * dim / 256.0).toInt)
            hist(bin) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var i = 0
        while (i < dim) { hist(i) /= n; i += 1 }
        Some((w, h, hist))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decoder for modalities with no pure-JVM codec (audio/video)
    * and undecodable image bytes: deterministic pseudo-dimensions and a
    * `dim`-float feature vector derived from payload bytes (a rolling
    * polynomial over byte values). Replace with a real codec + model.
    */
  private[operators] def decodeStub(payload: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    val bytes = if (payload == null) Array.empty[Byte] else payload
    val h0 = bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
    val width = 16 + math.floorMod(h0, 1024).toInt
    val height = 16 + math.floorMod(h0 >> 10, 1024).toInt
    val feats = Array.tabulate(dim) { i =>
      val hi = bytes.foldLeft(h0 + i)((h, b) => 131 * h + b + i)
      (math.floorMod(hi, 2000) - 1000) / 1000.0f
    }
    (width, height, feats)
  }

  /** Ingest raw media files from a directory tree via Spark's
    * `binaryFile` source — the 100 TB ingestion path for image/audio
    * dumps: each file becomes one row (path, modificationTime, length,
    * content) read in parallel across input splits, no driver-side
    * listing loop. Rows are shaped into the media schema: media_id =
    * a deterministic hash of the path (stable across re-ingests),
    * kind = from the file extension, meta carries path + mtime.
    * `pathGlob` prunes at the LISTING level (e.g. `*.png`) — files
    * that don't match are never opened. Nested shard layouts (files
    * under `shard0/`, `shard1/`, ... subdirectories — the normal dump
    * shape) are walked via `recursiveFileLookup`, not partition
    * inference.
    *
    * media_id is a 64-bit hash of (path, length): stable across
    * re-ingests of the same file, and the extra length term pushes the
    * birthday-collision horizon past a path-only hash. As with the
    * fingerprint operator, collisions are assumed absent at realistic
    * file counts; pipelines above ~1e8 files should carry `meta.path`
    * as the true key.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      pathGlob: String = "*"): Dataset[MediaItem] = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlob)
      .option("recursiveFileLookup", "true")
      .load(dir)
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val kind = when(ext.isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
      .when(ext.isin("mp4", "mkv", "webm", "avi"), "video")
      .otherwise("binary")
    asMedia(raw.select(
      xxhash64(col("path"), col("length")).as("media_id"),
      kind.as("kind"),
      col("content").as("payload"),
      map(lit("path"), col("path"),
        lit("mtime"), col("modificationTime").cast("string")).as("meta")))(
      spark)
  }

  /** Wrap a DataFrame with binary media columns into the typed
    * Dataset. Accepts any source frame with compatible columns.
    */
  def asMedia(df: DataFrame)(implicit s: SparkSession): Dataset[MediaItem] = {
    import s.implicits._
    df.select(
        col("media_id").cast("long"),
        col("kind").cast("string"),
        col("payload").cast("binary"),
        col("meta").cast("map<string,string>"))
      .as[MediaItem]
  }

  /** Batched decode + feature extraction: `mapPartitions` with
    * `grouped(batchSize)` so the (stubbed) decoder sees real batches.
    * Narrow transformation — scales by input partitions, no shuffle.
    */
  def extractFeatures(ds: Dataset[MediaItem], dim: Int = 16,
      batchSize: Int = defaultBatchSize): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // image batches decode for real (ImageIO); a model-based
        // featurizer would run the whole batch in one call here
        batch.map { m =>
          val payload = Option(m.payload).getOrElse(Array.empty[Byte])
          val (w, h, f) =
            (if (m.kind == "image") decodeImage(payload, dim) else None)
              .getOrElse(decodeStub(payload, dim))
          MediaFeatures(m.media_id, m.kind, payload.length, w, h, f)
        }
      }
    }
  }

  /** "Resize": emit target dimensions + scale factors as metadata —
    * the real implementation would transform pixels; the plumbing
    * (projection shape, aspect-ratio math) is real.
    */
  def resizePlan(feats: Dataset[MediaFeatures], maxSide: Int): DataFrame = {
    val f = feats.toDF()
    val scale = least(lit(maxSide) / col("width"), lit(maxSide) / col("height"),
      lit(1.0))
    // least(..., maxSide) guards against float dust pushing
    // ceil(side * scale) one pixel past the clamp (1000 * 64/1000
    // floats to 64.00000000000001).
    f.select(col("media_id"), col("width"), col("height"),
      round(scale, 6).as("scale"),
      least(ceil(col("width") * scale), lit(maxSide)).cast("int")
        .as("out_width"),
      least(ceil(col("height") * scale), lit(maxSide)).cast("int")
        .as("out_height"))
  }

  /** Frame sampling for video-kind rows: every `stride`-th frame index
    * up to a fake per-item frame count derived from payload size (a
    * real impl reads the container's frame count). Generates
    * (media_id, frame_idx) rows via explode — narrow, partition-local.
    */
  def frameSamplePlan(ds: Dataset[MediaItem], stride: Int): DataFrame = {
    val df = ds.toDF()
    val nFrames = greatest(
      (length(col("payload")) / 1024).cast("int"), lit(1))
    df.filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), nFrames - 1, lit(stride))).as("frame_idx"))
  }
}
