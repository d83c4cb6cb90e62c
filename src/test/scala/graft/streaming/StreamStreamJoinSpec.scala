package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/**
 * Stream-stream inner join with watermark-bounded state — a capability
 * entirely absent from the reference (no joins at all, no two-stream
 * combination; SURVEY.md §2.2). Each side carries a watermark and the
 * time-range condition bounds how long a row waits for matches, so join
 * state is evictable — the only shape that survives unbounded streams.
 */
class StreamStreamJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clicks join purchases within 10 minutes, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)

    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]

    val c = clicks.toDF().toDF("user_id", "c_ts", "click_id")
      .withWatermark("c_ts", "0 seconds")
    val p = purchases.toDF().toDF("p_user_id", "p_ts", "purchase_id")
      .withWatermark("p_ts", "0 seconds")

    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select("click_id", "purchase_id")

    val query = joined.writeStream
      .format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData((1L, t("2024-03-01 10:00:00"), 100L))
      purchases.addData((1L, t("2024-03-01 10:05:00"), 900L)) // within window
      query.processAllAvailable()
      clicks.addData((1L, t("2024-03-01 12:00:00"), 101L))
      purchases.addData((1L, t("2024-03-01 12:30:00"), 901L)) // outside 10 min
      query.processAllAvailable()

      val got = spark.table("ssj").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 900L)), s"got $got")
    } finally query.stop()
  }

  test("StreamJoins.follows (streaming) is row-identical to RangeJoin.follows (batch)") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic two-stream workload: 5 users, 120 events per side,
    // timestamps striding so some pairs fall inside the 10-minute
    // horizon and some straddle it
    def ts(i: Long) = new Timestamp(1709280000000L + i * 97000L) // 97 s apart
    val viewRows = (0L until 120L).map(i => (i % 5, ts(i), 1000L + i))
    val clickRows = (0L until 120L).map(i => (i % 5, ts(i * 3 / 2), 2000L + i))

    val batchViews = viewRows.toDF("user_id", "ts", "event_id")
    val batchClicks = clickRows.toDF("user_id", "ts", "event_id")
    val expected = graft.operators.RangeJoin
      .follows(batchViews, batchClicks, "user_id", "ts", "event_id", 600000000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    // the same predicate in one batch call of the streaming twin
    val batchTwin = StreamJoins
      .follows(batchViews, batchClicks, "user_id", "ts", "event_id", "10 minutes")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(batchTwin == expected)

    // now as two real watermarked streams, fed across several batches
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoins.follows(
      views.toDF().toDF("user_id", "ts", "event_id").withWatermark("ts", "1 minute"),
      clicks.toDF().toDF("user_id", "ts", "event_id").withWatermark("ts", "1 minute"),
      "user_id", "ts", "event_id", "10 minutes")
    val query = joined.select("a_id", "b_id").writeStream
      .format("memory").queryName("ssj_parity").outputMode("append").start()
    try {
      viewRows.grouped(40).zip(clickRows.grouped(40)).foreach { case (v, c) =>
        views.addData(v); clicks.addData(c)
        query.processAllAvailable()
      }
      val got = spark.table("ssj_parity").as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"streaming missing ${expected -- got}, extra ${got -- expected}")
      // watermark-bounded state: after the final watermark advance the
      // join holds far fewer rows than the 240 fed in
      val stateRows = query.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows < 240, s"join state not evicted: $stateRows rows")
    } finally query.stop()
  }

  test("followsLeftOuter (streaming) emits null-padded rows on watermark passage") {
    implicit val sqlCtx = spark.sqlContext
    def ts(i: Long) = new Timestamp(1709280000000L + i * 97000L)
    // user 4 gets views but never clicks — its rows can ONLY surface
    // through the outer path
    val viewRows = (0L until 80L).map(i => (i % 5, ts(i), 1000L + i))
    val clickRows = (0L until 80L).map(i => (i % 4, ts(i * 3 / 2), 2000L + i))

    val batchViews = viewRows.toDF("user_id", "ts", "event_id")
    val batchClicks = clickRows.toDF("user_id", "ts", "event_id")
    val expected = StreamJoins
      .followsLeftOuter(batchViews, batchClicks, "user_id", "ts", "event_id", "10 minutes")
      .select("a_id", "b_id").as[(Long, Option[Long])].collect().toSet
    assert(expected.exists(_._2.isEmpty), "fixture must have unmatched views")
    // the t21 composition (bucketed inner + anti-join union) agrees
    val inner = graft.operators.RangeJoin
      .follows(batchViews, batchClicks, "user_id", "ts", "event_id", 600000000L)
    val composed = inner.select("a_id", "b_id").as[(Long, Long)].collect()
      .map { case (a, b) => (a, Some(b): Option[Long]) }.toSet ++
      batchViews.join(inner.select("a_id"),
          batchViews("event_id") === col("a_id"), "left_anti")
        .select("event_id").as[Long].collect()
        .map(a => (a, None: Option[Long])).toSet
    assert(composed == expected)

    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoins.followsLeftOuter(
      views.toDF().toDF("user_id", "ts", "event_id").withWatermark("ts", "1 minute"),
      clicks.toDF().toDF("user_id", "ts", "event_id").withWatermark("ts", "1 minute"),
      "user_id", "ts", "event_id", "10 minutes")
    val query = joined.select("a_id", "b_id").writeStream
      .format("memory").queryName("ssj_outer").outputMode("append").start()
    try {
      viewRows.grouped(40).zip(clickRows.grouped(40)).foreach { case (v, c) =>
        views.addData(v); clicks.addData(c)
        query.processAllAvailable()
      }
      // before the watermark clears the tail, unmatched views near the
      // end are still pending; a far-future sentinel (excluded from
      // `expected` by its id, matching nothing) flushes them
      views.addData((9L, ts(10000L), 999999L))
      clicks.addData((9L, ts(10000L), 888888L))
      query.processAllAvailable()
      views.addData((9L, ts(10001L), 999998L)) // one more advance to drain
      query.processAllAvailable()
      val got = spark.table("ssj_outer").as[(Long, Option[Long])].collect().toSet
        .filterNot(r => r._1 >= 999000L)
      assert(got == expected,
        s"streaming missing ${expected -- got}, extra ${got -- expected}")
    } finally query.stop()
  }

  test("followsFullOuter (streaming) accounts for every row on both sides") {
    implicit val sqlCtx = spark.sqlContext
    def ts(i: Long) = new Timestamp(1709280000000L + i * 97000L)
    // user 4: views only (left-null-padded path); the i*3/2 click spread
    // also strands clicks with no prior in-horizon view (right path)
    val viewRows = (0L until 80L).map(i => (i % 5, ts(i), 1000L + i))
    val clickRows = (0L until 80L).map(i => (i % 4, ts(i * 3 / 2), 2000L + i))
    val batchViews = viewRows.toDF("user_id", "ts", "event_id")
    val batchClicks = clickRows.toDF("user_id", "ts", "event_id")
    val expected = StreamJoins
      .followsFullOuter(batchViews, batchClicks, "user_id", "ts", "event_id", "10 minutes")
      .select("a_id", "b_id").as[(Option[Long], Option[Long])].collect().toSet
    assert(expected.exists(_._1.isEmpty), "fixture must have orphan clicks")
    assert(expected.exists(_._2.isEmpty), "fixture must have unmatched views")
    // the t24 composition (bucketed inner + two anti-join unions) agrees
    val inner = graft.operators.RangeJoin
      .follows(batchViews, batchClicks, "user_id", "ts", "event_id", 600000000L)
    val composed: Set[(Option[Long], Option[Long])] =
      inner.select("a_id", "b_id").as[(Long, Long)].collect()
        .map { case (a, b) => (Some(a): Option[Long], Some(b): Option[Long]) }.toSet ++
      batchViews.join(inner.select("a_id"),
          batchViews("event_id") === col("a_id"), "left_anti")
        .select("event_id").as[Long].collect()
        .map(a => (Some(a): Option[Long], None: Option[Long])).toSet ++
      batchClicks.join(inner.select("b_id").distinct(),
          batchClicks("event_id") === col("b_id"), "left_anti")
        .select("event_id").as[Long].collect()
        .map(b => (None: Option[Long], Some(b): Option[Long])).toSet
    assert(composed == expected)

    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamJoins.followsFullOuter(
      views.toDF().toDF("user_id", "ts", "event_id").withWatermark("ts", "1 minute"),
      clicks.toDF().toDF("user_id", "ts", "event_id").withWatermark("ts", "1 minute"),
      "user_id", "ts", "event_id", "10 minutes")
    val query = joined.select("a_id", "b_id").writeStream
      .format("memory").queryName("ssj_full").outputMode("append").start()
    try {
      viewRows.grouped(40).zip(clickRows.grouped(40)).foreach { case (v, c) =>
        views.addData(v); clicks.addData(c)
        query.processAllAvailable()
      }
      views.addData((9L, ts(10000L), 999999L))
      clicks.addData((9L, ts(10000L), 888888L))
      query.processAllAvailable()
      views.addData((9L, ts(10001L), 999998L))
      clicks.addData((9L, ts(10001L), 888887L))
      query.processAllAvailable()
      val got = spark.table("ssj_full").as[(Option[Long], Option[Long])].collect().toSet
        .filterNot(r => r._1.exists(_ >= 999000L) || r._2.exists(_ >= 888000L))
      assert(got == expected,
        s"streaming missing ${expected -- got}, extra ${got -- expected}")
    } finally query.stop()
  }

  test("stream-static enrichment (t22): file-stream join to broadcast dim equals batch") {
    val sf = "/root/testdata/sf0.001"
    val expected = graft.SparkEntry.queries("t22_stream_enrich")(spark, sf)
      .as[(String, String, Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    val c = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val e = graft.sources.Tables.eventsStream(spark, sf)
    val enriched = e.join(broadcast(c), e("user_id") === c("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000).cast("long")).as("sum_v1e6"))
    val query = enriched.writeStream
      .format("memory").queryName("t22_stream").outputMode("complete").start()
    try {
      query.processAllAvailable()
      val got = spark.table("t22_stream")
        .as[(String, String, Long, Long)].collect().toSet
      assert(got == expected,
        s"missing ${expected -- got}, extra ${got -- expected}")
    } finally query.stop()
  }
}
