package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.operators.Dedup

/** Streaming exact dedup (`Dedup.exactKeptStream`): duplicate content is
  * suppressed across micro-batches with state bounded by the watermark —
  * the continuous-ingestion form of the corpus dedup cascade's first
  * stage. */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactKeptStream suppresses duplicate content across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDS().toDF("ts", "text").withWatermark("ts", "1 hour")
    val out = Dedup.exactKeptStream(df, "text")
    val q = out.writeStream.format("memory").queryName("s_dedup")
      .outputMode("append").start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "aaa"),
        (Timestamp.valueOf("2024-01-01 10:01:00"), "bbb"))
      q.processAllAvailable()
      // "aaa" again in a later batch: must be dropped by store state
      input.addData((Timestamp.valueOf("2024-01-01 10:02:00"), "aaa"),
        (Timestamp.valueOf("2024-01-01 10:03:00"), "ccc"))
      q.processAllAvailable()
      val texts = spark.table("s_dedup").select("text").as[String].collect().toSeq.sorted
      assert(texts == Seq("aaa", "bbb", "ccc"))
    } finally q.stop()
  }

  test("exactKeptStream on a batch frame degenerates to exact dedup") {
    val df = Seq("a", "a", "b").toDF("text")
    assert(Dedup.exactKeptStream(df, "text").count() == 2)
  }

  test("bloomContamination probes a STREAMING corpus against a static benchmark") {
    // the bloom build and exact shingle set live on the static bench
    // side; the corpus side is a stream — probe filter + stream-static
    // LeftSemi join + running per-doc counts in complete mode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val bench = Seq((1000L, "quick brown fox jumps high")).toDF("doc_id", "text")
    val out = Dedup.bloomContamination(docs, bench, "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("s_bloom")
      .outputMode("complete").start()
    try {
      input.addData((1L, "the quick brown fox jumps high today"),
        (2L, "nothing shared at all here"))
      q.processAllAvailable()
      input.addData((3L, "quick brown fox jumps"))
      q.processAllAvailable()
      val rows = spark.table("s_bloom").as[(Long, Long)].collect().toMap
      // doc 1 shares 3 of the bench's 3-grams, doc 3 shares 2, doc 2 none
      assert(rows == Map(1L -> 3L, 3L -> 2L))
    } finally q.stop()
  }
}
