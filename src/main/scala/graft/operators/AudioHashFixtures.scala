package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic WAV-PCM fixtures for the l83 audio-hash oracle —
 * [[ImageFixtures]]' audio twin: each payload is BUILT from a sample
 * formula simple enough that the expected 64-bit envelope hash is
 * derived BY HAND (literals below, never by running the operator),
 * and the DuckDB oracle is a VALUES relation of those expectations.
 *
 * Derivations (65 windows over the frame count; gray-ramp logic as
 * l78):
 *  - inc-ramp, 65 frames (1/window), sample(f) = 100·f: every window
 *    louder than the last → all 64 bits → hash = -1.
 *  - dec-ramp, sample(f) = 100·(64−f): never louder → 0.
 *  - constant 5000: equal windows, strict > never fires → 0.
 *  - inc-ramp at 130 frames (2/window), sample(f) = 50·f: window w
 *    averages {100w, 100w+50} → 100w+25, increasing → -1 (area-average
 *    path).
 *  - one-dip: 65-frame inc-ramp with frame 20 silenced → window 20
 *    drops to 0; bit 19 (win20 > win19: 0 > 1900) clears, bit 20
 *    (win21 > win20: 2100 > 0) stays → -1 with bit 19 cleared.
 *  - stereo: channel 0 carries the inc-ramp, channel 1 a loud constant
 *    → same hash as the mono ramp (pins channel-0 selection).
 *  - text bytes / 8-bit WAV: not canonical 16-bit PCM → decoded=false.
 */
object AudioHashFixtures {

  import graft.operators.Multimodal.MediaFile

  private def le16(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def tag(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  /** Canonical PCM WAV; `frames` samples per channel, interleaved. */
  private def wav(channels: Int, bits: Int, frames: Int)
                 (sampleOf: (Int, Int) => Int): Array[Byte] = {
    val align = channels * bits / 8
    val dataSize = frames.toLong * align
    val rate = 8000L
    val fmt = tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(rate) ++ le32(rate * align) ++ le16(align) ++ le16(bits)
    val data = Array.newBuilder[Byte]
    data ++= tag("data") ++= le32(dataSize)
    for (f <- 0 until frames; c <- 0 until channels) {
      val v = sampleOf(f, c)
      if (bits == 16) data ++= le16(v.toLong & 0xffffL)
      else data += (v & 0xff).toByte
    }
    val body = tag("WAVE") ++ fmt ++ data.result()
    tag("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** (doc_id, payload, expected decoded, expected ahash). */
  lazy val cases: Seq[(Long, Array[Byte], Boolean, Long)] = Seq(
    (1L, wav(1, 16, 65)((f, _) => 100 * f), true, -1L),
    (2L, wav(1, 16, 65)((f, _) => 100 * (64 - f)), true, 0L),
    (3L, wav(1, 16, 65)((_, _) => 5000), true, 0L),
    (4L, wav(1, 16, 130)((f, _) => 50 * f), true, -1L),
    (5L, wav(1, 16, 65)((f, _) => if (f == 20) 0 else 100 * f), true,
      -1L ^ (1L << 19)),
    (6L, wav(2, 16, 65)((f, c) => if (c == 0) 100 * f else 30000), true, -1L),
    (7L, "definitely not audio".getBytes("UTF-8"), false, 0L),
    (8L, wav(1, 8, 65)((f, _) => f), false, 0L))

  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(cases.map(c => MediaFile(c._1, c._2)))
  }

  /** The l83 DuckDB oracle: VALUES of the hand-derived expectations. */
  def oracleSql: String = {
    val rows = cases.map { case (id, _, dec, hash) =>
      s"(CAST($id AS BIGINT), $dec, CAST($hash AS BIGINT))"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(doc_id, decoded, ahash) ORDER BY doc_id"
  }
}
