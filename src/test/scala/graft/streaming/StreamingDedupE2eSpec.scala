package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.Dedup

/**
 * The composed streaming dedup story, end-to-end: file-stream ingest →
 * `nearDupKeptStreamStateful` (checkpoint-recovered in-horizon claim
 * state) → `foreachBatch(nearDupAdmitAndAppend)` (corpus-scale bands
 * table + exactly-once markers) → sink, via `Dedup.nearDupPipeline`.
 *
 * The property under test is AGREEMENT between the two state layers
 * across a mid-sequence checkpoint restart: a near-dup of a pre-restart
 * admit must lose — to the recovered claim state while in-horizon AND to
 * the bands snapshot re-read at restart — and the full streamed
 * admission set must equal what the batch `bandClaimKept` computes over
 * the entire ingest in one go (stream/batch parity of the shared
 * claim/resolve semantics).
 */
class StreamingDedupE2eSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nearDupPipeline: ingest → stateful claim → admit-and-append → sink, with restart") {
    val root = java.nio.file.Files.createTempDirectory("graft_e2e_nd")
      .toFile.getAbsolutePath
    val src = s"$root/src"; val ckpt = s"$root/ckpt"
    val bandsDir = s"$root/bands"

    // both near-dup pairs share SOME but not all bands (verified below),
    // so the CLAIM stage — not the exact-signature dedup, whose
    // within-batch pick is arbitrary for full-signature-identical docs —
    // is what resolves them; bDup arrives AFTER the restart and must
    // lose to pre-restart b via the recovered claim state
    val a = "minhash signatures compress shingle sets into short comparable sketches for retrieval"
    val aDup = "minhash signatures compress shingle sets into today comparable sketches for retrieval"
    val b = "structured streaming recovers keyed claim state from its checkpoint directory reliably"
    val bDup = "structured streaming recovers scoped claim state from its checkpoint directory reliably"
    val c = "an entirely unrelated document about broadcast joins and partition pruning"

    val allDocs = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, a),
      (Timestamp.valueOf("2024-01-01 10:01:00"), 2L, aDup), // same-batch near-dup
      (Timestamp.valueOf("2024-01-01 10:02:00"), 3L, b),
      (Timestamp.valueOf("2024-01-01 10:10:00"), 4L, bDup), // post-restart near-dup
      (Timestamp.valueOf("2024-01-01 10:11:00"), 5L, c))
    // sanity: exactly the two planted pairs are LSH candidates, and each
    // pair's band overlap is PARTIAL (1-3 of 4) so the claim stage decides
    val cand = Dedup.minhashCandidatePairs(
        allDocs.toDF("ts", "doc_id", "text"), "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cand == Set((1L, 2L), (3L, 4L)), s"candidates: $cand")
    val bandRows = Dedup.withBandColumns(
        allDocs.toDF("ts", "doc_id", "text"), "text", 8, 4, 3)
      .select("doc_id", "__band0", "__band1", "__band2", "__band3")
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    Seq((1L, 2L), (3L, 4L)).foreach { case (x, y) =>
      val shared = bandRows(x).zip(bandRows(y)).count { case (u, v) => u == v }
      assert(shared >= 1 && shared <= 3, s"pair ($x,$y) shares $shared/4 bands")
    }

    val docSchema = allDocs.take(1).toDF("ts", "doc_id", "text").schema
    def writeBatch(rows: Seq[(Timestamp, Long, String)]): Unit =
      rows.toDF("ts", "doc_id", "text").write.mode("append").parquet(src)

    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(docSchema).parquet(src)
        .withWatermark("ts", "1 hour")
      val q = Dedup.nearDupPipeline(stream, "text", "ts", bandsDir, ckpt,
        (df, bid) => delivered += ((bid, df.select("doc_id").as[Long].collect().toSet)))
      q.awaitTermination()
    }

    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, "false")
    try {
      // run 1: the same-batch near-dup pair resolves first-arrival-wins
      writeBatch(allDocs.take(3))
      runOnce()
      val run1 = delivered.flatMap(_._2).toSet
      assert(run1 == Set(1L, 3L), s"run 1 admitted: $delivered")

      // restart from the same checkpoint: bDup (in-horizon near-dup of
      // pre-restart b) must lose — recovered claim state and the bands
      // snapshot re-read at restart agree; c flows through
      writeBatch(allDocs.drop(3))
      runOnce()
      val streamed = delivered.flatMap(_._2).toSet
      assert(streamed == Set(1L, 3L, 5L), s"after restart: $delivered")

      // and the bands table agrees with the delivery log: replaying the
      // admitted docs against it admits nothing new
      val admittedDocs = allDocs.filter(d => streamed.contains(d._2))
      val replayKept = Dedup.nearDupKeptStream(
          admittedDocs.toDF("ts", "doc_id", "text"), "text",
          Dedup.readBandsOrEmpty(spark, bandsDir))
        .select("doc_id").as[Long].collect().toSet
      assert(replayKept.isEmpty,
        s"bands table disagrees with the delivery log: re-admitted $replayKept")

      // stream/batch parity: the one-shot batch claim over the WHOLE
      // ingest (arrival order = doc id order here) keeps the same set
      val batchKept = Dedup.bandClaimKept(
          allDocs.toDF("ts", "doc_id", "text"), "text", "doc_id")
        .select("doc_id").as[Long].collect().toSet
      assert(batchKept == streamed,
        s"batch parity broken: batch=$batchKept stream=$streamed")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None => spark.conf.unset(checkKey)
      }
    }
  }
}
