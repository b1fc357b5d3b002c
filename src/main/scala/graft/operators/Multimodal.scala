package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3 #33).
  *
  * Pattern for image/audio/video at 100 TB: the payload travels as an opaque
  * `binary` column; decode / feature-extraction runs per-partition so each
  * task touches only its batch (bounded memory, no driver involvement), and
  * everything downstream of decode is ordinary typed columns.
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — with a deterministic fake (dimensions derived from byte length).
  * The Spark-side plumbing is real: binary encoding, typed Dataset schema,
  * mapPartitions batch shape, and metadata extraction are exactly what a real
  * decoder would plug into (swap [[decodeStub]]'s body for the codec call).
  */
object Multimodal {

  /** An opaque media payload: id + raw bytes. */
  case class MediaBlob(doc_id: Long, data: Array[Byte])

  /** Decoded metadata a real codec would emit. */
  case class MediaMeta(doc_id: Long, byte_len: Long, prefix_hex: String,
                       fake_width: Int, fake_height: Int)

  /** STUB decode: a real implementation would parse the container header
    * (e.g. PNG IHDR / JPEG SOF) from `data`. Deterministic fake so the
    * pipeline is oracle-checkable end-to-end.
    */
  def decodeStub(blob: MediaBlob): MediaMeta = {
    val len = blob.data.length.toLong
    val prefix = blob.data.take(4).map(b => f"${b & 0xff}%02X").mkString
    MediaMeta(blob.doc_id, len, prefix,
      fake_width = (len % 640).toInt, fake_height = (len % 480).toInt)
  }

  /** Binary-column pipeline: text bytes stand in for a media payload. The
    * decode runs inside `mapPartitions` (one JVM call per batch of rows — the
    * Scala analogue of `mapInPandas` batch processing).
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs: Dataset[MediaBlob] = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
      .as[MediaBlob]
    blobs.mapPartitions(_.map(decodeStub)).toDF().orderBy("doc_id")
  }
}
