package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed batch-at-a-time.
  *
  * The Spark-side machinery — schema, partition-preserving typed
  * `mapPartitions`, deterministic batch shape — is real and tested; the
  * actual codec step is STUBBED (no image/audio libraries exist in this
  * container) behind [[Codec.decodeStub]], a deterministic fake keyed
  * on the payload bytes. Swapping in a real decoder changes only that
  * function: everything else (column layout, partitioning, feature
  * schema) is production-shaped for a 100 TB media corpus, where the
  * payloads stay distributed and only fixed-width features ever shuffle.
  */
object Multimodal {
  /** One media row: opaque payload + typed metadata. */
  final case class MediaFile(doc_id: Long, media_type: String,
                             payload: Array[Byte], source: String)

  /** Fixed-width decoded features (what a real decoder would emit). */
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Int, checksum: String,
                                 width: Int, height: Int,
                                 n_frames: Int, mean_intensity: Double)

  /** Deterministic fake codec — replace with a real decoder offline. */
  object Codec {
    /** STUB: derives plausible dimensions/intensity from the bytes. A
      * real implementation would decode the payload; this keeps the
      * numbers a pure function of content so tests are reproducible. */
    def decodeStub(payload: Array[Byte], mediaType: String): (Int, Int, Int, Double) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.floorMod(h, 1024)
      val height = 64 + math.floorMod(h >> 10, 1024)
      val frames = if (mediaType == "video") 1 + math.floorMod(h >> 20, 240) else 1
      val intensity = math.floorMod(h, 256) / 255.0
      (width, height, frames, intensity)
    }
  }

  /** Wrap a text table into media rows (payload = UTF-8 bytes) — the
    * in-container stand-in for reading real media blobs. */
  def asMedia(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))
      .as[MediaFile]
  }

  /** Decode + feature-extract, partition-at-a-time. The per-partition
    * loop is the batch shape a vectorized codec needs (amortized init,
    * sequential payload access); checksum/byte-count stay in the plan
    * via the typed row so nothing re-reads payloads downstream. */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { m =>
        val (w, h, f, mi) = Codec.decodeStub(m.payload, m.media_type)
        digest.reset()
        val checksum = digest.digest(m.payload)
          .map(b => f"$b%02x").mkString
        MediaFeatures(m.doc_id, m.media_type, m.payload.length, checksum,
          w, h, f, mi)
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th frame index —
    * the plumbing for a real frame extractor (explode stays lazy, so
    * frames distribute instead of collecting). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Resize stub: recomputes target dimensions preserving aspect ratio
    * (longest side → `maxSide`); a real implementation would transcode
    * the payload — the plumbing (schema, pure-function-of-row shape,
    * no payload shuffle) is what production swaps onto. */
  def resize(features: Dataset[MediaFeatures], maxSide: Int): DataFrame = {
    // integer-exact on the longest side: (side * maxSide) / longest —
    // a double `floor(side * scale)` loses the last pixel whenever
    // maxSide/longest is inexact in binary (e.g. 3000→1999, not 2000)
    val longest = greatest(col("width"), col("height"))
    def scaled(side: org.apache.spark.sql.Column) =
      greatest(lit(1), least(side,
        (side.cast("long") * maxSide) / longest.cast("long"))).cast("int")
    features.toDF()
      .withColumn("resized_width", scaled(col("width")))
      .withColumn("resized_height", scaled(col("height")))
  }
}
