package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.operators.Multimodal.{MediaFile, VideoMeta}

/**
 * Deterministic video-container fixtures for the l48 oracle query.
 *
 * The driver's testdata parquet carries no real container bytes, so the
 * payloads are BUILT here, byte-exactly, from construction parameters
 * (the same ISO BMFF / RIFF / EBML layouts ffmpeg writes, minus codec
 * payload the header walks never read). The DuckDB oracle's expected
 * rows are derived from THE SAME CONSTRUCTION PARAMETERS — never by
 * running the parsers — so l48 certifies that `Multimodal`'s MP4/AVI/MKV
 * header walks read back exactly what the construction wrote, on an
 * engine-independent ground truth. Stub-fallback expectations restate
 * the stub contract arithmetic inline (the same formulas l13's SQL
 * mirrors), not by calling `decodeStub`.
 *
 * Five rows, one per decode path: MP4 (ISO BMFF box walk), AVI (RIFF
 * chunk walk), MKV with Clusters (EBML walk + bounded block-header frame
 * count), an audio-only MP4 (well-formed container, no video track →
 * stub fallback), and raw text bytes (not a container → stub fallback).
 */
object VideoFixtures {

  // ---- ISO BMFF (MP4) construction: [size:4][type:4][payload] ----
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** mvhd v0: timescale + duration ticks → duration ms = ticks·1000/scale. */
  private def mvhd(timescale: Long, ticks: Long): Array[Byte] =
    box("mvhd", be32(0), be32(0), be32(0), be32(timescale), be32(ticks),
      Array.fill(80)(0.toByte))

  /** trak with tkhd v0 dimensions (16.16 fixed point) and an stsz sample
    * count; w = h = 0 makes it a non-video (audio) track. */
  private def trak(w: Long, h: Long, frames: Long): Array[Byte] = {
    val tkhd = box("tkhd",
      be32(0), be32(0), be32(0), be32(1), be32(0), be32(2500),
      Array.fill(8 + 2 + 2 + 2 + 2 + 36)(0.toByte),
      be32(w << 16), be32(h << 16))
    val stsz = box("stsz", be32(0), be32(0), be32(frames))
    box("trak", tkhd, box("mdia", box("minf", box("stbl", stsz))))
  }

  private val Mp4W = 320L; private val Mp4H = 180L
  private val Mp4Frames = 50L; private val Mp4DurMs = 2500L // 2500 ticks @ 1000/s
  private def mp4Payload: Array[Byte] =
    box("ftyp", "isom".getBytes("ISO-8859-1"), be32(512)) ++
      box("moov", mvhd(1000L, 2500L), trak(Mp4W, Mp4H, Mp4Frames))

  private def audioMp4Payload: Array[Byte] =
    box("moov", mvhd(1000L, 2500L), trak(0L, 0L, 0L))

  // ---- RIFF (AVI) construction: [fourcc][size:4 LE][payload] ----
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(fourcc: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    fourcc.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  }

  private val AviW = 640L; private val AviH = 360L
  private val AviFrames = 100L; private val AviUsPerFrame = 40000L
  private val AviDurMs = AviFrames * AviUsPerFrame / 1000L // 4000 ms
  private def aviPayload: Array[Byte] = {
    val avih = chunk("avih", le32(AviUsPerFrame), le32(0), le32(0), le32(0),
      le32(AviFrames), le32(0), le32(0), le32(0), le32(AviW), le32(AviH),
      Array.fill(16)(0.toByte))
    val hdrl = chunk("LIST", "hdrl".getBytes("ISO-8859-1"), avih)
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl
    "RIFF".getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body
  }

  // ---- EBML (MKV) construction: [id vint][size vint][payload] ----
  private def eid(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
  private def esize(n: Int): Array[Byte] =
    if (n < 127) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  private def el(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    id ++ esize(body.length) ++ body
  }
  private def be(v: Long, n: Int): Array[Byte] =
    (n - 1 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private val MkvW = 1280L; private val MkvH = 720L
  private val MkvDurMs = 2500L // 2500 ticks × 1 ms/tick
  private val MkvFrames = 3L   // 2 SimpleBlocks + 1 BlockGroup below
  private def mkvPayload: Array[Byte] = {
    val info = el(eid(0x15, 0x49, 0xA9, 0x66),
      el(eid(0x2A, 0xD7, 0xB1), be(1000000L, 3)), // TimestampScale: 1 ms/tick
      el(eid(0x44, 0x89), be(java.lang.Double.doubleToLongBits(MkvDurMs.toDouble), 8)))
    val video = el(eid(0xE0),
      el(eid(0xB0), be(MkvW, 2)), el(eid(0xBA), be(MkvH, 2)))
    val tracks = el(eid(0x16, 0x54, 0xAE, 0x6B),
      el(eid(0xAE), el(eid(0x83), be(1L, 1)), video))
    val blockBytes = Array(0x81, 0x00, 0x00, 0x80, 1, 2, 3).map(_.toByte)
    val cluster1 = el(eid(0x1F, 0x43, 0xB6, 0x75),
      el(eid(0xE7), be(0L, 1)),
      el(eid(0xA3), blockBytes), el(eid(0xA3), blockBytes))
    val cluster2 = el(eid(0x1F, 0x43, 0xB6, 0x75),
      el(eid(0xA0), el(eid(0xA1), blockBytes)))
    el(eid(0x1A, 0x45, 0xDF, 0xA3)) ++
      el(eid(0x18, 0x53, 0x80, 0x67), info, tracks, cluster1, cluster2)
  }

  private def textPayload: Array[Byte] =
    "just plain text bytes, not any media container at all".getBytes("UTF-8")

  /** The stub contract restated from its construction arithmetic (byte
    * length only) — the same formulas l13's oracle SQL mirrors. Stub
    * duration is n_frames × 40 ms (the stub's 25 fps make-believe). */
  private def stubExpected(id: Long, bl: Long): VideoMeta = {
    val frames = bl / 100 + 1
    VideoMeta(id, bl, 64 + bl % 512, 64 + (bl * 31) % 512,
      frames, frames * 40L, container = "stub")
  }

  /** (payload, expected metadata) — expectations from construction
    * parameters, never from the parsers under test. */
  lazy val fixtures: Seq[(MediaFile, VideoMeta)] = {
    val mp4 = mp4Payload; val avi = aviPayload; val mkv = mkvPayload
    val audio = audioMp4Payload; val text = textPayload
    Seq(
      (MediaFile(1L, mp4),
        VideoMeta(1L, mp4.length.toLong, Mp4W, Mp4H, Mp4Frames, Mp4DurMs, "mp4")),
      (MediaFile(2L, avi),
        VideoMeta(2L, avi.length.toLong, AviW, AviH, AviFrames, AviDurMs, "avi")),
      (MediaFile(3L, mkv),
        VideoMeta(3L, mkv.length.toLong, MkvW, MkvH, MkvFrames, MkvDurMs, "mkv")),
      (MediaFile(4L, audio), stubExpected(4L, audio.length.toLong)),
      (MediaFile(5L, text), stubExpected(5L, text.length.toLong)))
  }

  /** The l48 input frame. */
  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(fixtures.map(_._1))
  }

  /** The l48 DuckDB oracle: a VALUES relation of the construction-side
    * expectations (rendered at declaration time from the same constants
    * the payload builders used). */
  def oracleSql: String = {
    val rows = fixtures.map { case (_, m) =>
      s"(CAST(${m.doc_id} AS BIGINT), CAST(${m.byte_len} AS BIGINT), " +
        s"CAST(${m.width} AS BIGINT), CAST(${m.height} AS BIGINT), " +
        s"CAST(${m.n_frames} AS BIGINT), CAST(${m.duration_ms} AS BIGINT), " +
        s"'${m.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, byte_len, width, height, n_frames, duration_ms, container) " +
      "ORDER BY doc_id"
  }
}
