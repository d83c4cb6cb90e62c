package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.operators.Multimodal.{AudioMeta, MediaFile}

/**
 * Deterministic audio-container fixtures for the l61 oracle query —
 * the audio twin of [[VideoFixtures]] (l48): payloads are BUILT
 * byte-exactly from construction parameters (the same RIFF/WAVE, FLAC
 * STREAMINFO, and MPEG-1 Layer III frame-header layouts encoders write,
 * minus sample payload the header walks never read), and the DuckDB
 * oracle's expected rows are derived from THE SAME construction
 * parameters — never by running the parsers — so l61 certifies that
 * `Multimodal`'s WAV/FLAC/MP3 header walks read back exactly what the
 * construction wrote.
 *
 * Five rows, one per decode path: WAV (RIFF chunk walk), FLAC
 * (STREAMINFO bit unpack), MP3 (frame-sync header + CBR duration
 * estimate), a truncated WAV prefix (magic only → stub fallback), and
 * raw text bytes (not a container → stub fallback).
 */
object AudioFixtures {

  private def le16(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def tag(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  // ---- WAV: mono 16-bit PCM @ 8 kHz, 8000 samples → exactly 1000 ms ----
  private val WavCh = 1L; private val WavRate = 8000L
  private val WavBits = 16L; private val WavSamples = 8000L
  private val WavDurMs = WavSamples * 1000L / WavRate
  private def wavPayload: Array[Byte] = {
    val align = WavCh * WavBits / 8
    val dataSize = WavSamples * align
    val fmt = tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(WavCh) ++
      le32(WavRate) ++ le32(WavRate * align) ++ le16(align) ++ le16(WavBits)
    val data = tag("data") ++ le32(dataSize) ++
      Array.fill(dataSize.toInt)(0.toByte)
    val body = tag("WAVE") ++ fmt ++ data
    tag("RIFF") ++ le32(body.length.toLong) ++ body
  }

  // ---- FLAC: stereo 24-bit @ 48 kHz, 96000 samples → exactly 2000 ms ----
  private val FlacCh = 2L; private val FlacRate = 48000L
  private val FlacBits = 24L; private val FlacSamples = 96000L
  private val FlacDurMs = FlacSamples * 1000L / FlacRate
  private def flacPayload: Array[Byte] = {
    val packed = (FlacRate << 44) | ((FlacCh - 1) << 41) |
      ((FlacBits - 1) << 36) | FlacSamples
    val packedBytes = (7 to 0 by -1).map(i => ((packed >> (8 * i)) & 0xff).toByte)
    val streaminfo =
      Array(0x10, 0x00, 0x10, 0x00).map(_.toByte) ++ // min/max blocksize 4096
        Array.fill(6)(0.toByte) ++                   // min/max framesize unknown
        packedBytes ++
        Array.fill(16)(0.toByte)                     // MD5 of raw audio (unset)
    tag("fLaC") ++ Array(0x80, 0, 0, 34).map(_.toByte) ++ streaminfo
  }

  // ---- MP3: MPEG-1 Layer III 128 kbps @ 44.1 kHz stereo, 1600 bytes
  // → CBR duration 1600·8/128 = exactly 100 ms ----
  private val Mp3Bytes = 1600L; private val Mp3Kbps = 128L
  private val Mp3Rate = 44100L; private val Mp3Ch = 2L
  private val Mp3DurMs = Mp3Bytes * 8 / Mp3Kbps
  private val Mp3Samples = Mp3DurMs * Mp3Rate / 1000L
  private def mp3Payload: Array[Byte] =
    // sync + MPEG-1 Layer III (FB), bitrate idx 9 = 128 kbps + rate idx 0
    // = 44100 (90), stereo mode (00); the rest is opaque frame payload
    Array(0xff, 0xfb, 0x90, 0x00).map(_.toByte) ++
      Array.fill(Mp3Bytes.toInt - 4)(0.toByte)

  private def truncatedWav: Array[Byte] = tag("RIFF") ++ le32(36) ++ tag("WAVE")
  private def textPayload: Array[Byte] =
    "these bytes are prose, not an audio container".getBytes("UTF-8")

  /** The stub contract restated from its construction arithmetic (byte
    * length only): 1 + bl%2 channels, 8000 + (bl·7)%40000 Hz, 16-bit,
    * one sample per byte. */
  private def stubExpected(id: Long, bl: Long): AudioMeta = {
    val rate = 8000L + (bl * 7) % 40000L
    AudioMeta(id, bl, 1L + bl % 2, rate, 16L, bl, bl * 1000L / rate, "stub")
  }

  /** (payload, expected metadata) — expectations from construction
    * parameters, never from the parsers under test. */
  lazy val fixtures: Seq[(MediaFile, AudioMeta)] = {
    val wav = wavPayload; val flac = flacPayload; val mp3 = mp3Payload
    val trunc = truncatedWav; val text = textPayload
    Seq(
      (MediaFile(1L, wav),
        AudioMeta(1L, wav.length.toLong, WavCh, WavRate, WavBits,
          WavSamples, WavDurMs, "wav")),
      (MediaFile(2L, flac),
        AudioMeta(2L, flac.length.toLong, FlacCh, FlacRate, FlacBits,
          FlacSamples, FlacDurMs, "flac")),
      (MediaFile(3L, mp3),
        AudioMeta(3L, Mp3Bytes, Mp3Ch, Mp3Rate, 0L, Mp3Samples,
          Mp3DurMs, "mp3")),
      (MediaFile(4L, trunc), stubExpected(4L, trunc.length.toLong)),
      (MediaFile(5L, text), stubExpected(5L, text.length.toLong)))
  }

  /** The l61 input frame. */
  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(fixtures.map(_._1))
  }

  /** The l61 DuckDB oracle: a VALUES relation of the construction-side
    * expectations. */
  def oracleSql: String = {
    val rows = fixtures.map { case (_, m) =>
      s"(CAST(${m.doc_id} AS BIGINT), CAST(${m.byte_len} AS BIGINT), " +
        s"CAST(${m.n_channels} AS BIGINT), CAST(${m.sample_rate} AS BIGINT), " +
        s"CAST(${m.bits_per_sample} AS BIGINT), CAST(${m.n_samples} AS BIGINT), " +
        s"CAST(${m.duration_ms} AS BIGINT), '${m.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, byte_len, n_channels, sample_rate, bits_per_sample, " +
      "n_samples, duration_ms, container) ORDER BY doc_id"
  }
}
