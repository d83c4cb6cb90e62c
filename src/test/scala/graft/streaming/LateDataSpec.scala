package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.api.{Env, Event}

/**
 * Late-data semantics: the reference has NO late-data handling — an
 * event arriving after its session closed silently opens a new session
 * (SURVEY.md §2.2). Spark's watermark is strictly stronger: events older
 * than the watermark are DROPPED before the stateful operator, so a
 * closed session can never be contradicted. This spec pins that
 * difference as the documented, intended behavior.
 */
class LateDataSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(v: Long, t: String) = Event.at(v, Timestamp.valueOf(t))

  test("an event behind the watermark is dropped, not re-sessionized") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event[Long]]
    val sessions = Env(spark).fromDataset(input.toDS())
      .withWatermark("0 seconds")
      .keyBy(_ => "k")
      .window(Duration.ofMinutes(10))
      .aggregate(identity[Long])(_ + _)

    val query = sessions.ds.writeStream
      .format("memory").queryName("late_sess").outputMode("append").start()
    try {
      input.addData(ev(1, "2024-01-01 10:00:00"))
      query.processAllAvailable()
      // advance the watermark to 14:00 and close the first session
      input.addData(ev(10, "2024-01-01 14:00:00"))
      query.processAllAvailable()
      input.addData(ev(20, "2024-01-01 15:00:00"))
      query.processAllAvailable()
      // 10:05 is far behind the 15:00 watermark → dropped
      input.addData(ev(99, "2024-01-01 10:05:00"))
      input.addData(ev(30, "2024-01-01 16:00:00"))
      query.processAllAvailable()
      input.addData(ev(40, "2024-01-01 17:00:00"))
      query.processAllAvailable()

      val fired = spark.table("late_sess").as[Event[Long]].collect().toSeq
      // the 10:00 session fired with only value 1; 99 appears nowhere
      assert(fired.map(_.value).count(_ == 1L) == 1)
      assert(!fired.exists(e => e.value == 99L || e.value == 100L), s"got $fired")
    } finally query.stop()
  }
}
