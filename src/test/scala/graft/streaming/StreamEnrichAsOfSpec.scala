package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

/** SCD-2 temporal enrichment on a stream: event joins the dimension
  * version valid at its event time; stream rows == batch rows
  * (stateless broadcast join + range filter). */
class StreamEnrichAsOfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private val dim = Seq(
    // key 1: price changes on day 10
    (1L, "p@100", t(1, 0), t(10, 0)),
    (1L, "p@120", t(10, 0), t(31, 0)),
    // key 2: single version starting day 5 (events before it unmatched)
    (2L, "p@50", t(5, 0), t(31, 0)))

  private val events = Seq(
    (1L, t(9, 23), 1.0),   // last hour of v0
    (1L, t(10, 0), 2.0),   // inclusive lower bound of v1
    (2L, t(6, 0), 3.0),
    (2L, t(2, 0), 4.0),    // before key 2's first version
    (3L, t(6, 0), 5.0))    // key with no dimension at all

  test("stream enrichment rows == batch rows; boundaries and misses honored") {
    implicit val sqlCtx = spark.sqlContext
    val dimDf = dim.toDF("k", "tier", "valid_from", "valid_to")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "ts", "value", "tier")
        .as[(Long, Timestamp, Double, String)].collect().toSet

    val batch = shape(StreamJoins.enrichAsOf(
      events.toDF("user_id", "ts", "value"), dimDf,
      "user_id", "ts", "k", "valid_from", "valid_to"))
    assert(batch == Set(
      (1L, t(9, 23), 1.0, "p@100"),
      (1L, t(10, 0), 2.0, "p@120"),
      (2L, t(6, 0), 3.0, "p@50")))

    val input = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamJoins.enrichAsOf(
      input.toDF().toDF("user_id", "ts", "value"), dimDf,
      "user_id", "ts", "k", "valid_from", "valid_to")
    val query = out.writeStream.format("memory").queryName("scd2")
      .outputMode("append").start()
    try {
      events.grouped(2).foreach { g => input.addData(g); query.processAllAvailable() }
      assert(shape(spark.table("scd2")) == batch)
    } finally query.stop()
  }

  test("left_outer keeps unmatched events null-padded") {
    val out = StreamJoins.enrichAsOf(
        events.toDF("user_id", "ts", "value"),
        dim.toDF("k", "tier", "valid_from", "valid_to"),
        "user_id", "ts", "k", "valid_from", "valid_to", how = "left_outer")
      .select("user_id", "tier")
      .as[(Long, Option[String])].collect()
    assert(out.length == events.length)
    assert(out.filter(_._2.isEmpty).map(_._1).sorted.toSeq == Seq(2L, 3L))
  }
}
