package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.api.{Env, Event}
import graft.sources.Tables

/**
 * Stateful streaming/batch duality over the REAL file source: the facade
 * keyed running count over `eventsStream` (flatMapGroupsWithState,
 * AvailableNow) must equal the same facade pipeline over the batch read —
 * both fold per key in (eventTime, processingTime) order.
 */
class KeyedStateFileStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def toEvents(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select(col("ts"), col("user_id"), col("event_id"))
      .as[(Timestamp, Long, Long)]
      .map { case (ts, uid, eid) => Event(ts, Some(ts), (uid, eid)) }
  }

  private def countsOf(ds: org.apache.spark.sql.Dataset[Event[(Long, Long)]]) = {
    import spark.implicits._
    Env(spark).fromDataset(ds)
      .keyBy(_.value._1)
      .processState((_: Long) => 0L) { (k, e, n) =>
        (n + 1, Seq(e.withValue((k, e.value._2, n + 1))))
      }.ds
  }

  test("streamed keyed running count equals the batch fold") {
    import spark.implicits._
    val streamed = countsOf(toEvents(Tables.eventsStream(spark, sf)))
    val query = streamed.writeStream
      .format("memory").queryName("ks_file")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()

    val got = spark.table("ks_file").as[Event[(Long, Long, Long)]]
      .collect().map(_.value).toSet
    val expected = countsOf(toEvents(Tables.events(spark, sf)))
      .collect().map(_.value).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
