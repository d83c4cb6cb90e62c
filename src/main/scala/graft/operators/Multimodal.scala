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

  /**
   * REAL image decode for the formats the JDK ships codecs for
   * (PNG/BMP/GIF/JPEG via `javax.imageio` — no native library needed):
   * parses the actual pixel dimensions. Payloads ImageIO cannot read
   * (video containers, raw text bytes) fall back to [[decodeStub]], so
   * the video path stays a clearly-marked stub while images are genuine.
   * Static images are one frame; decode failure is data, not an error —
   * a corrupt payload in a 100 TB corpus must not kill the stage.
   */
  def decodeImage(m: MediaFile): MediaMeta = {
    // NonFatal, not just IOException: the JDK codecs throw runtime
    // exceptions (ArrayIndexOutOfBounds, NegativeArraySize, …) on
    // truncated/crafted payloads, and those must also be data here.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) decodeStub(m)
    else MediaMeta(m.doc_id, m.payload.length.toLong,
      width = img.getWidth.toLong, height = img.getHeight.toLong,
      n_frames = 1L, n_sampled = 1L)
  }

  /** [[extractMeta]] with the real image decoder at the same
    * `mapPartitions` boundary — identical schema, partitioning, and batch
    * shape, so swapping decoders is invisible to the rest of the plan. */
  def extractMetaImages(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeImage))
  }

  /** Demo source: treat document text bytes as the media payload. */
  def filesFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaFile]
  }

  /** One sampled frame reference (media id, frame index). */
  final case class FrameRef(doc_id: Long, frame_idx: Long)

  /** A decoded-and-resized frame: stub payload carries (w, h) only; a
    * real decoder would emit the pixel buffer in `payload`. */
  final case class ResizedFrame(doc_id: Long, frame_idx: Long,
                                width: Long, height: Long, payload: Array[Byte])

  /**
   * Frame sampling: every `every`-th frame per media item, 1→N via the
   * declarative `explode(sequence(...))` — stays in the relational plan
   * (codegen, no UDF) because frame *selection* is pure arithmetic; only
   * decode needs imperative code.
   */
  def sampleFrames(metas: Dataset[MediaMeta], every: Int): Dataset[FrameRef] = {
    import metas.sparkSession.implicits._
    metas.toDF()
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(every.toLong))).as("frame_idx"))
      .as[FrameRef]
  }

  /**
   * STUB resize: joins the sampled frames back to the payloads and "runs
   * the codec" per partition (deterministic fake: payload = first 16
   * bytes; dimensions = the target box preserving the stub aspect). The
   * join is the real plumbing: frame refs shuffle to the payload's
   * partitioning; a native decoder drops into `mapPartitions` unchanged.
   */
  def resizeFrames(files: Dataset[MediaFile], frames: Dataset[FrameRef],
                   maxW: Long, maxH: Long): Dataset[ResizedFrame] = {
    import files.sparkSession.implicits._
    files.joinWith(frames, files("doc_id") === frames("doc_id"))
      .mapPartitions(_.map { case (f, fr) =>
        val meta = decodeStub(f)
        val scale = math.min(maxW.toDouble / meta.width, maxH.toDouble / meta.height)
        ResizedFrame(f.doc_id, fr.frame_idx,
          math.max(1, (meta.width * scale).toLong),
          math.max(1, (meta.height * scale).toLong),
          f.payload.take(16))
      })
  }
}
