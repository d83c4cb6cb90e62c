package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.api.Event

/** transformWithState (Spark 4 state API) parity: the running count it
  * produces across micro-batches must match what
  * KeyedGStream.processState computes via flatMapGroupsWithState. */
class TwsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(v: Long, t: String) = Event.at(v, Timestamp.valueOf(t))

  test("transformWithState running count accumulates across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val counts = Tws.runningCount[Long](input.toDS(), _.value % 2)
      val query = counts.writeStream
        .format("memory").queryName("tws_count").outputMode("append").start()
      try {
        input.addData(ev(0, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:01:00"))
        query.processAllAvailable()
        input.addData(ev(2, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00"))
        query.processAllAvailable()
        val out = spark.table("tws_count").as[(Long, Long, Long)].collect().toSet
        // (key, value, running count): key 0 sees 0 then 2; key 1 sees 1 then 3
        assert(out == Set((0L, 0L, 1L), (0L, 2L, 2L), (1L, 1L, 1L), (1L, 3L, 2L)))
      } finally query.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState session aggregate fires on watermark close-out") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val sessions = Tws.sessionAggregate[String, Long, Long](
        input.toDS().withWatermark("eventTime", "0 seconds"),
        e => if (e.value < 100) "k" else "other", 10L * 60 * 1000000L, identity, _ + _)
      val query = sessions.writeStream
        .format("memory").queryName("tws_sess").outputMode("append").start()
      try {
        // one session {12:00, 12:05}: must not fire while wm < 12:15
        input.addData(ev(1, "2009-10-11 12:00:00"), ev(2, "2009-10-11 12:05:00"))
        query.processAllAvailable()
        assert(spark.table("tws_sess").count() == 0)
        // far-future events advance the watermark; the TIMER (not new
        // data for key k) must close the session
        input.addData(ev(100, "2009-10-11 14:00:00"))
        query.processAllAvailable()
        input.addData(ev(101, "2009-10-11 15:00:00"))
        query.processAllAvailable()
        val fired = spark.table("tws_sess").as[Event[Long]].collect().toSeq
        assert(fired.map(_.value).contains(3L), s"got $fired")
        assert(fired.find(_.value == 3L).get.eventTime
          .contains(Timestamp.valueOf("2009-10-11 12:05:00")))
      } finally query.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
