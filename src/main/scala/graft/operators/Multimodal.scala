package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (north-star extension): media payloads
 * travel as opaque `binary` columns with typed metadata; decode /
 * feature-extract run per-partition so a real codec (absent from this
 * container — the decode below is a clearly-marked deterministic STUB)
 * drops in without touching the schema, partitioning, or batch shape.
 *
 * Scale notes: the typed `mapPartitions` boundary is where a JNI/native
 * decoder would amortize per-batch init; payloads never pass through the
 * driver; downstream columns are plain longs so Catalyst prunes the
 * (huge) binary column immediately after feature extraction.
 */
object Multimodal {

  /** An opaque media payload + id — the ingest schema. */
  final case class MediaFile(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata — all derivable arithmetic in the stub. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                             height: Long, n_frames: Long, n_sampled: Long)

  /**
   * STUB decode: a real implementation would parse container headers /
   * decode frames here. The stub derives deterministic pseudo-metadata
   * from the byte length only, so the Spark-side plumbing (schema,
   * encoders, partition-wise batching) is real and oracle-checkable.
   */
  def decodeStub(m: MediaFile): MediaMeta = {
    val bl = m.payload.length.toLong
    val frames = bl / 100 + 1
    MediaMeta(m.doc_id, bl,
      width = 64 + bl % 512,
      height = 64 + (bl * 31) % 512,
      n_frames = frames,
      n_sampled = (frames + 9) / 10)
  }

  /** Typed decode pipeline: binary-in, metadata-out, per-partition. */
  def extractMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeStub))
  }

  /** Demo source: treat document text bytes as the media payload. */
  def filesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaFile]
  }
}
