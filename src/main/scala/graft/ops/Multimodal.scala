package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: images/audio/video ride as opaque `binary`
 * columns with typed metadata; decode / feature-extraction runs in
 * `mapPartitions` so any native decoder is initialized once per partition
 * and the bytes never leave the executors (the Scala analogue of
 * `mapInPandas` batching).
 *
 * The decode step itself is a clearly-marked DETERMINISTIC STUB — the
 * container has no image/audio codecs — but the Spark-side contract
 * (schema, batch shape, partition-local init, streaming iterator) is real
 * and is exactly what a production decoder would plug into.
 *
 * Scale: binary payloads stay distributed; the iterator-to-iterator
 * mapPartitions never materializes a partition in memory; metadata-only
 * queries prune the payload column at the parquet scan.
 */
object Multimodal {

  case class MediaRow(
      doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long, thumb_bytes: Int)

  /** Synthesize a media table from `documents`: text bytes stand in for
    * encoded media; metadata is deterministic from doc_id. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"),
      (lit(64) + (col("doc_id") % 8) * 32).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 5) * 32).cast("int").as("height"))

  /**
   * "Decode" + feature-extract each payload. STUB: checksum + derived
   * thumbnail size replace a real codec; a production implementation
   * swaps only the body of `decodeOne`.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init happens here (codec contexts, model weights…)
      rows.map(decodeOne)
    }
  }

  private def decodeOne(m: MediaRow): MediaFeatures = {
    // ??? — real decoder goes here; deterministic fake below keeps the
    // pipeline testable without codecs in the container.
    var checksum = 0L
    var i = 0
    while (i < m.payload.length) { checksum = checksum * 31 + (m.payload(i) & 0xff); i += 1 }
    MediaFeatures(
      m.doc_id, m.media_type, m.payload.length, m.width, m.height,
      checksum, math.min(m.payload.length, m.width * m.height / 16))
  }

  case class Thumb(doc_id: Long, media_type: String,
      thumb_w: Int, thumb_h: Int, thumb: Array[Byte])

  /**
   * Resize stage (STUB decode, real contract): scale every image's
   * payload down so max(w, h) == `maxDim`, preserving aspect ratio. The
   * stub "pixel data" is a deterministic byte slice sized w·h/64; a real
   * implementation swaps only the resample call. 1-in/1-out rows via the
   * same partition-local-init mapPartitions contract as decode.
   */
  def resize(spark: SparkSession, media: DataFrame, maxDim: Int = 64): Dataset[Thumb] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
        val (tw, th) = (math.max(1, (m.width * scale).toInt), math.max(1, (m.height * scale).toInt))
        val n = math.min(m.payload.length, math.max(1, tw * th / 64))
        Thumb(m.doc_id, m.media_type, tw, th, m.payload.take(n))
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, byte_offset: Long, frame_checksum: Long)

  /**
   * Frame sampling (STUB decode, real contract): each video row fans out
   * to `framesPerVideo` sampled frames — the 1-in/N-out iterator shape a
   * real demuxer plugs into. Offsets stride the payload evenly; the
   * per-frame checksum hashes the frame's byte window. Lazy iterator
   * composition: no partition is materialized, so a 2-hour video row
   * streams frames without buffering them all.
   */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      framesPerVideo: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.filter(_.media_type == "video").flatMap { m =>
        val stride = math.max(1L, m.payload.length.toLong / framesPerVideo)
        (0 until framesPerVideo).iterator.map { i =>
          val off = math.min(i * stride, math.max(0L, m.payload.length - 1L))
          val end = math.min(off + stride, m.payload.length.toLong).toInt
          var checksum = 0L
          var j = off.toInt
          while (j < end) { checksum = checksum * 31 + (m.payload(j) & 0xff); j += 1 }
          Frame(m.doc_id, i, off, checksum)
        }
      }
    }
  }

  /** End-to-end pipeline used by the query registry. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, mediaTable(docs)).toDF().orderBy("doc_id")
}
