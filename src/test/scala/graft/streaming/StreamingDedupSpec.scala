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

  test("withBandColumns matches the batch lshBands pipeline value-for-value") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away home"),
      (2L, "completely different text about spark structured streaming state stores"),
      (3L, "xy")) // too short to shingle → null bands
      .toDF("doc_id", "text")
    val batch = Dedup.lshBands(Dedup.minhashSignatures(docs, "text", "doc_id"), "doc_id")
      .as[(Long, Int, String)].collect().toSet
    val narrow = Dedup.withBandColumns(docs, "text")
      .collect().flatMap { r =>
        (0 until 4).flatMap { b =>
          Option(r.getAs[String](s"__band$b")).map(h => (r.getAs[Long]("doc_id"), b, h))
        }
      }.toSet
    assert(narrow == batch, s"narrow $narrow\nbatch $batch")
    assert(!narrow.exists(_._1 == 3L)) // short doc has no bands either way
  }

  test("nearDupKeptStream drops a planted near-dup arriving in a later batch") {
    implicit val sqlCtx = spark.sqlContext
    val corpusA = "the quick brown fox jumps over the lazy dog and then runs away home tonight"
    // near-dup of A: one word changed at the end — shares most shingles
    val nearA = "the quick brown fox jumps over the lazy dog and then runs away home yesterday"
    val fresh = "spark structured streaming keeps per key state in a rocksdb backed store"
    val corpus = Seq((100L, corpusA),
      (101L, "a totally unrelated second corpus document about parquet column pruning rules"))
      .toDF("doc_id", "text")
    // sanity: the batch pipeline itself calls (A, nearA) a candidate pair —
    // so the streaming path MUST catch it via the shared band
    val cand = Dedup.minhashCandidatePairs(
        corpus.union(Seq((200L, nearA)).toDF("doc_id", "text")), "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((100L, 200L)), s"planted pair not a candidate: $cand")

    val seen = Dedup.lshBands(Dedup.minhashSignatures(corpus, "text", "doc_id"), "doc_id")
      .select("band_idx", "band_hash").localCheckpoint()
    val input = MemoryStream[(Timestamp, String)]
    val stream = input.toDS().toDF("ts", "text").withWatermark("ts", "1 hour")
    val out = Dedup.nearDupKeptStream(stream, "text", seen)
    val q = out.writeStream.format("memory").queryName("s_neardup")
      .outputMode("append").start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 10:00:00"), fresh))
      q.processAllAvailable()
      // later batch: near-dup of corpus doc A → dropped (band match in
      // seenBands); exact repeat of `fresh` → dropped (full-sig state);
      // a genuinely new doc → kept
      input.addData(
        (Timestamp.valueOf("2024-01-01 10:05:00"), nearA),
        (Timestamp.valueOf("2024-01-01 10:06:00"), fresh),
        (Timestamp.valueOf("2024-01-01 10:07:00"),
          "another new document mentioning broadcast joins and shuffle partitions today"))
      q.processAllAvailable()
      val texts = spark.table("s_neardup").select("text").as[String].collect().toSeq
      assert(texts.count(_ == fresh) == 1, s"got $texts")
      assert(!texts.contains(nearA), s"near-dup survived: $texts")
      assert(texts.exists(_.startsWith("another new document")), s"got $texts")
      assert(texts.size == 2, s"got $texts")
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
