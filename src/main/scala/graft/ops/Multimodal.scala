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

  /** End-to-end pipeline used by the query registry. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame =
    extractFeatures(spark, mediaTable(docs)).toDF().orderBy("doc_id")
}
