package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark
import graft.api.{Env, Event}

/**
 * The facade's streaming stateful paths with `spark.graft.stateful.tws`
 * enabled: the SAME pipelines the flatMapGroupsWithState specs pin must
 * produce the SAME outputs when routed through `transformWithState`
 * (Tws.KeyedFold / OrderedKeyedFold / SessionAgg) — the flag swaps the
 * state backend, never the semantics.
 */
class TwsFacadeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(value: Long, time: String): Event[Long] =
    Event.at(value, Timestamp.valueOf(time))

  /** Run `body` with the TWS flag + RocksDB provider set, restoring both. */
  private def withTws[A](body: => A): A = {
    val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.graft.stateful.tws", "true")
    try body
    finally {
      spark.conf.unset("spark.graft.stateful.tws")
      prevProv match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flagged keyed processState accumulates across batches via transformWithState") {
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val counts = Env(spark).fromDataset(input.toDS())
        .keyBy(_.value % 2)
        .processState((_: Long) => 0L) { (k, e, n) =>
          (n + 1, Seq(e.withValue((k, n + 1))))
        }
      // the flag must actually reroute the plan onto the new API
      assert(counts.ds.queryExecution.analyzed.toString.contains("TransformWithState"),
        counts.ds.queryExecution.analyzed.toString.take(500))
      val query = counts.ds
        .writeStream.format("memory").queryName("tws_fac_count").outputMode("append").start()
      try {
        input.addData(ev(0, "2009-10-11 12:00:00"), ev(1, "2009-10-11 12:01:00"))
        query.processAllAvailable()
        input.addData(ev(2, "2009-10-11 12:02:00"), ev(3, "2009-10-11 12:03:00"))
        query.processAllAvailable()
        val out = spark.table("tws_fac_count").as[Event[(Long, Long)]]
          .collect().toSeq.map(_.value).sorted
        assert(out == Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L)))
      } finally query.stop()
    }
  }

  test("flagged watermarked keyed processState folds in event-time order") {
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val seqd = Env(spark).fromDataset(input.toDS())
        .withWatermark("30 minutes")
        .keyBy(_ => "k")
        .processState((_: String) => 0L) { (_, e, n) =>
          (n + 1, Seq(e.withValue((e.value, n + 1))))
        }
      val query = seqd.ds
        .writeStream.format("memory").queryName("tws_fac_ordered").outputMode("append").start()
      try {
        input.addData(ev(1, "2009-10-11 12:10:00"), ev(3, "2009-10-11 12:30:00"))
        query.processAllAvailable()
        input.addData(ev(2, "2009-10-11 12:20:00")) // out of order, within the delay
        query.processAllAvailable()
        assert(spark.table("tws_fac_ordered").count() == 0)
        input.addData(ev(4, "2009-10-11 14:00:00")) // watermark → 13:30
        query.processAllAvailable()
        val got = spark.table("tws_fac_ordered").as[Event[(Long, Long)]]
          .collect().toSeq.map(_.value)
        assert(got.sorted == Seq((1L, 1L), (2L, 2L), (3L, 3L)), s"got $got")
      } finally query.stop()
    }
  }

  test("flagged watermarked keyed fold equals batch on random multi-batch input") {
    // OrderedKeyedFold cross-check: same shape as the fMGWS-backend test in
    // StreamingSessionCrossCheckSpec, running through transformWithState.
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val rnd = new scala.util.Random(5432)
      val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime
      val events = (0 until 300).map { i =>
        val key = rnd.nextInt(5)
        val t = base + key * 7200000L + rnd.nextInt(240) * 60000L
        Event(new Timestamp(t), Some(new Timestamp(t)), (key.toLong, 1L))
      }
      val closer = {
        val t = base + 90L * 86400000L
        Event(new Timestamp(t), Some(new Timestamp(t)), (99L, 0L))
      }

      def fold(ks: graft.api.KeyedGStream[Long, (Long, Long)]) =
        ks.processState((_: Long) => 0L) { (k, e, n) =>
          (n + 1, Seq(e.withValue((k, n + 1))))
        }

      val batch = fold(Env(spark)
          .fromDataset(spark.createDataset(events :+ closer)).keyBy(_.value._1))
        .collectEvents()
        .map(e => (e.eventTime.get, e.value)).sorted

      val input = MemoryStream[Event[(Long, Long)]]
      val streamed = fold(Env(spark).fromDataset(input.toDS())
        .withWatermark("30 days").keyBy(_.value._1))
      val query = streamed.ds.writeStream
        .format("memory").queryName("tws_fac_xcheck").outputMode("append").start()
      try {
        rnd.shuffle(events).grouped(75).foreach { b =>
          input.addData(b: _*)
          query.processAllAvailable()
        }
        input.addData(closer)
        query.processAllAvailable()
        val fired = spark.table("tws_fac_xcheck").as[Event[(Long, Long)]]
          .collect().map(e => (e.eventTime.get, e.value)).sorted.toSeq
        val expectedReady = batch.filterNot(s =>
          s._1.getTime >= base + 90L * 86400000L)
        assert(fired == expectedReady,
          s"streamed=${fired.size} batch-ready=${expectedReady.size}")
      } finally query.stop()
    }
  }

  test("flagged windowed processState threads key state across batches") {
    // the StreamingParitySpec scenario, rerouted through Tws.SessionProcessState
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val out = Env(spark).fromDataset(input.toDS())
        .withWatermark("0 seconds")
        .keyBy(_.value)
        .window(Duration.ofMinutes(10))
        .processState((_: Long) => 0L) { (k, _, evs, n) =>
          (n + 1, Seq(evs.head.withValue((k, n))))
        }
      assert(out.ds.queryExecution.analyzed.toString.contains("TransformWithState"),
        out.ds.queryExecution.analyzed.toString.take(500))
      val query = out.ds
        .writeStream.format("memory").queryName("tws_fac_wps").outputMode("append").start()
      try {
        input.addData(ev(0, "2009-10-11 12:10:00"), ev(0, "2009-10-11 12:30:00"),
          ev(0, "2009-10-11 12:39:00"))
        query.processAllAvailable()
        input.addData(ev(1, "2009-10-11 12:55:00"), ev(1, "2009-10-11 12:56:00"))
        query.processAllAvailable()
        input.addData(ev(2, "2009-10-11 13:20:00"))
        query.processAllAvailable()
        input.addData(ev(9, "2009-10-11 15:00:00"))
        query.processAllAvailable()
        input.addData(ev(9, "2009-10-11 15:30:00"))
        query.processAllAvailable()

        val got = spark.table("tws_fac_wps").as[Event[(Long, Long)]].collect().toSeq
          .map(e => (e.eventTime.get, e.value)).toSet
        assert(got == Set(
          (Timestamp.valueOf("2009-10-11 12:10:00"), (0L, 0L)),
          (Timestamp.valueOf("2009-10-11 12:30:00"), (0L, 1L)),
          (Timestamp.valueOf("2009-10-11 12:55:00"), (1L, 0L)),
          (Timestamp.valueOf("2009-10-11 13:20:00"), (2L, 0L)),
          (Timestamp.valueOf("2009-10-11 15:00:00"), (9L, 0L))), s"got $got")
      } finally query.stop()
    }
  }

  test("flagged windowed process delivers full time-ordered session contents") {
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val out = Env(spark).fromDataset(input.toDS())
        .withWatermark("10 minutes") // allow the bridging event to arrive "late"
        .keyBy(_ => "k")
        .window(Duration.ofMinutes(10))
        .process((_, b, evs) => Seq(evs.last.withValue(
          (b.start, b.lastEventTime, evs.map(_.value)))))
      assert(out.ds.queryExecution.analyzed.toString.contains("TransformWithState"),
        out.ds.queryExecution.analyzed.toString.take(500))
      val query = out.ds
        .writeStream.format("memory").queryName("tws_fac_wp").outputMode("append").start()
      try {
        // delivered out of time order within the session, and a bridging
        // event in a later batch merges two open sessions
        input.addData(ev(2, "2009-10-11 12:16:00"), ev(1, "2009-10-11 12:00:00"))
        query.processAllAvailable()
        input.addData(ev(3, "2009-10-11 12:08:00")) // bridges 12:00 and 12:16
        query.processAllAvailable()
        input.addData(ev(9, "2009-10-11 14:00:00"))
        query.processAllAvailable()
        input.addData(ev(9, "2009-10-11 15:00:00"))
        query.processAllAvailable()

        val got = spark.table("tws_fac_wp")
          .as[Event[(Timestamp, Timestamp, Seq[Long])]].collect().toSeq.map(_.value)
        // ONE merged session with time-ordered contents 1,3,2
        assert(got.map(_._3).contains(Seq(1L, 3L, 2L)), s"got $got")
        val s = got.find(_._3 == Seq(1L, 3L, 2L)).get
        assert(s._1 == Timestamp.valueOf("2009-10-11 12:00:00"))
        assert(s._2 == Timestamp.valueOf("2009-10-11 12:16:00"))
      } finally query.stop()
    }
  }

  test("flagged windowed processStateGlobal assigns global counters in close order") {
    // the StreamingParitySpec overlapping-sessions scenario, with BOTH
    // stages (windowed key fold + per-batch global fold) on TWS
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      // must be set BEFORE composing — the guard fails fast at composition
      spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
      val out = Env(spark).fromDataset(input.toDS())
        .withWatermark("0 seconds")
        .keyBy(_.value)
        .window(Duration.ofMinutes(10))
        .processStateGlobal((_: Long) => 0L, 0L)(
          (k, _, evs, kn) => (kn + 1, Seq(evs.head.withValue((k, kn)))))(
          (e, gn) => (gn + 1, Seq(e.withValue((e.value._1, gn)))))
      val query = out.ds
        .writeStream.format("memory").queryName("tws_fac_wpsg").outputMode("append").start()
      try {
        input.addData(ev(0, "2009-10-11 12:00:00"), ev(0, "2009-10-11 12:08:00"),
          ev(0, "2009-10-11 12:16:00"), ev(0, "2009-10-11 12:24:00"),
          ev(0, "2009-10-11 12:32:00"), ev(0, "2009-10-11 12:40:00"),
          ev(1, "2009-10-11 12:30:00"), ev(1, "2009-10-11 12:31:00"))
        query.processAllAvailable()
        input.addData(ev(7, "2009-10-11 12:45:00"))
        query.processAllAvailable() // wm 12:45 → key 1 closes: global 0
        input.addData(ev(7, "2009-10-11 14:00:00"))
        query.processAllAvailable() // wm 14:00 → key 0 (12:50), key 7 (12:55)
        input.addData(ev(9, "2009-10-11 15:00:00"))
        query.processAllAvailable() // wm 15:00 → key 7's second session

        val got = spark.table("tws_fac_wpsg").as[Event[(Long, Long)]].collect().toSeq
          .map(_.value).toSet
        assert(got == Set((1L, 0L), (0L, 1L), (7L, 2L), (7L, 3L)), s"got $got")
      } finally {
        query.stop()
        spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
      }
    }
  }

  test("flagged windowed aggregate fires on watermark close-out") {
    withTws {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event[Long]]
      val sessions = Env(spark).fromDataset(input.toDS())
        .withWatermark("0 seconds")
        .keyBy(_ => "k")
        .window(Duration.ofMinutes(10))
        .aggregate(identity[Long])(_ + _)
      assert(sessions.ds.queryExecution.analyzed.toString.contains("TransformWithState"),
        sessions.ds.queryExecution.analyzed.toString.take(500))
      val query = sessions.ds
        .writeStream.format("memory").queryName("tws_fac_agg").outputMode("append").start()
      try {
        input.addData(ev(1, "2009-10-11 12:00:00"), ev(2, "2009-10-11 12:05:00"))
        query.processAllAvailable()
        assert(spark.table("tws_fac_agg").count() == 0)
        input.addData(ev(100, "2009-10-11 14:00:00"))
        query.processAllAvailable()
        input.addData(ev(101, "2009-10-11 15:00:00"))
        query.processAllAvailable()
        val fired = spark.table("tws_fac_agg").as[Event[Long]].collect().toSeq
        assert(fired.map(_.value).contains(3L), s"got $fired")
        assert(fired.find(_.value == 3L).get.eventTime
          .contains(Timestamp.valueOf("2009-10-11 12:05:00")))
      } finally query.stop()
    }
  }
}
