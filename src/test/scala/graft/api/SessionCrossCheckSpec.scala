package graft.api

import java.sql.Timestamp
import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.Sessionize

/**
 * Invariant check tying the two session implementations together: the
 * typed facade's gaps-and-islands scan (WindowedGStream/SessionScan) must
 * produce byte-identical sessions to Spark's native `session_window`
 * (graft.operators.Sessionize) on the same input — including merge
 * behavior under out-of-order, duplicate-timestamp, and boundary-exact
 * events. Seeded pseudo-random input, so failures reproduce.
 */
class SessionCrossCheckSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed session scan matches native session_window on random events") {
    val rnd = new scala.util.Random(42)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 400 events over 8 keys; inter-event steps straddle the 10-min gap,
    // including exact-boundary steps (600s) and duplicate timestamps (0s).
    val events = (0 until 400).map { i =>
      val key = rnd.nextInt(8)
      val step = Seq(0L, 30L, 120L, 599L, 600L, 601L, 1200L)(rnd.nextInt(7))
      val t = new Timestamp(base + i * 1000L + key * 86400000L + step * 60000L * rnd.nextInt(3))
      (key, Event.at(i.toLong, t))
    }
    val gap = Duration.ofMinutes(10)

    // key lookup by payload (each event's value is its unique index)
    val keyOf = events.map { case (k, e) => e.value -> k }.toMap
    val typedSessions = Env(spark).fromEvents(events.map(_._2))
      .keyBy(e => keyOf(e.value))
      .window(gap)
      .process((k, b, evs) => Seq(evs.head.withValue(
        (k, b.start, b.lastEventTime, evs.size.toLong, evs.map(_.value).sum))))
      .collectValues()
      .sortBy(v => (v._1, v._2.getTime))

    val df = spark.createDataset(events.map { case (k, e) =>
      (k, e.eventTime.get, e.value)
    }).toDF("key", "ts", "value")
    val native = Sessionize.sessions(df, "ts", "key", "10 minutes",
        Seq(count(lit(1)).as("n"), sum(col("value")).as("sv")))
      .select("key", "session_start", "session_end_last", "n", "sv")
      .as[(Int, Timestamp, Timestamp, Long, Long)]
      .collect().toSeq
      .sortBy(v => (v._1, v._2.getTime))

    assert(typedSessions.size == native.size)
    typedSessions.zip(native).foreach { case (t, n) =>
      assert(t == n, s"typed=$t native=$n")
    }
  }
}
