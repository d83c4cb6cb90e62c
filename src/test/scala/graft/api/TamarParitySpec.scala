package graft.api

import java.sql.Timestamp
import java.time.Duration

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/**
 * Port of the reference engine's test suite
 * (/root/reference/src/lib.rs:958-1646) against the graft facade,
 * re-expressed order-insensitively where Spark gives no cross-partition
 * ordering (SURVEY.md §5.2): assertions sort outputs, and stateful tests
 * pin determinism with explicit event times ((eventTime, processingTime)
 * is the declared fold order, SURVEY.md §7.5.3).
 */
class TamarParitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def env = Env(spark)
  import spark.implicits._

  /** Event on the reference tests' fixed date (`new_event`,
    * /root/reference/src/lib.rs:1171-1186): event = processing time. */
  private def ev(value: Int, hour: Int, minute: Int): Event[Int] =
    Event.at(value, Timestamp.valueOf(f"2009-10-11 $hour%02d:$minute%02d:00"))

  private val gap10 = Duration.ofMinutes(10)

  // --- reference e2e: source → sink (src/lib.rs:1087-1097) ---
  test("source to sink carries every value") {
    assert(env.fromValues(0 until 10).collectValues().sorted == (0 until 10))
  }

  // --- filter (src/lib.rs:1099-1115) ---
  test("filter keeps only passing events") {
    val out = env.fromValues(0 until 10).filter(_.value % 2 == 0).collectValues()
    assert(out.sorted == Seq(0, 2, 4, 6, 8))
  }

  // --- map + with_value metadata propagation (src/lib.rs:38-45,:127-144) ---
  test("map via withValue preserves timestamps") {
    val out = env.fromEvents(Seq(ev(7, 12, 30)))
      .map(e => e.withValue(e.value * 2))
      .collectEvents()
    assert(out.map(_.value) == Seq(14))
    assert(out.head.eventTime.contains(Timestamp.valueOf("2009-10-11 12:30:00")))
    assert(out.head.processingTime == Timestamp.valueOf("2009-10-11 12:30:00"))
  }

  // --- process 1→N (src/lib.rs:1117-1134) ---
  test("process emits zero or more events per input") {
    val out = env.fromValues(Seq(0, 1, 2, 3))
      .process(e => Seq.fill(e.value)(e.withValue(e.value)))
      .collectValues()
    assert(out.sorted == Seq(1, 2, 2, 3, 3, 3))
  }

  // --- keyed process_state (src/lib.rs:1141-1169) ---
  test("keyed processState counts per key independently") {
    val events = (0 until 8).map(i => ev(i, 12, i)) // key = i % 2
    val out = env.fromEvents(events)
      .keyBy(_.value % 2)
      .processState((_: Int) => 0) { (k, e, n) =>
        (n + 1, Seq(e.withValue((k, e.value, n + 1))))
      }
      .collectValues()
    // per key, counts rise 1..4 in event-time order
    assert(out.sorted == Seq((0, 0, 1), (0, 2, 2), (0, 4, 3), (0, 6, 4),
      (1, 1, 1), (1, 3, 2), (1, 5, 3), (1, 7, 4)))
  }

  // --- global process_state (src/lib.rs:1289-1314) ---
  test("global processState sees every event in time order") {
    val events = (0 until 6).map(i => ev(10 + i, 12, i))
    val out = env.fromEvents(events)
      .processState(0) { (e, n) => (n + 1, Seq(e.withValue((e.value, n + 1)))) }
      .collectValues()
    assert(out.sorted == Seq((10, 1), (11, 2), (12, 3), (13, 4), (14, 5), (15, 6)))
  }

  // --- keyed process_state with BOTH the global AND per-key state the
  // reference signature passes (src/lib.rs:323-361; test :1141-1169 emits
  // (global.count, key_state.count) per event) ---
  test("processStateGlobal mirrors the reference global + key counters") {
    // reference source a,b,a,b → sink [(0,0),(1,0),(2,1),(3,1)]
    val events = Seq(ev(10, 12, 0), ev(20, 12, 1), ev(10, 12, 2), ev(20, 12, 3))
    val out = env.fromEvents(events)
      .keyBy(_.value)
      .processStateGlobal((_: Int) => 0, 0)(
        (k, e, n) => (n + 1, Seq(e.withValue((k, n)))))(
        (e, g) => (g + 1, Seq(e.withValue((g, e.value._2)))))
      .collectEvents()
    val byTime = out.sortBy(_.eventTime.get.getTime).map(_.value)
    assert(byTime == Seq((0, 0), (1, 0), (2, 1), (3, 1)))
  }

  // --- windowed process_state with BOTH the global AND per-key state the
  // reference's full windowed signature passes (src/lib.rs:771-784; test
  // windowed_process_state_joined_events, src/lib.rs:1438-1486, emits
  // (global.count, key_state.count) per closed session) ---
  test("windowed processStateGlobal mirrors the reference global + key counters") {
    // reference timeline: key 0 @ 12:10,12:12,12:13; key 1 @ 12:41,12:42;
    // key 2 @ 12:53; gap 10 min → one session per key, closing in start
    // order, global counter advancing across keys. The reference sink sees
    // only [(0,0), (1,0)] because its input ends before key 2's session
    // can trigger; the batch path closes every session at end-of-input
    // (established convention — see "windowed processState threads state
    // across a key's sessions"), so key 2's (2,0) appears here too, with
    // the reference's output as a prefix.
    val events = Seq(ev(0, 12, 10), ev(0, 12, 12), ev(0, 12, 13),
      ev(1, 12, 41), ev(1, 12, 42), ev(2, 12, 53))
    val out = env.fromEvents(events)
      .keyBy(_.value)
      .window(gap10)
      .processStateGlobal((_: Int) => 0, 0)(
        (k, _, evs, kn) => (kn + 1, Seq(evs.head.withValue((k, kn)))))(
        (e, gn) => (gn + 1, Seq(e.withValue((gn, e.value._2)))))
      .collectEvents()
    val byTime = out.sortBy(_.eventTime.get.getTime)
    assert(byTime.map(_.value) == Seq((0, 0), (1, 0), (2, 0)))
    assert(byTime.map(_.eventTime.get) == Seq(
      Timestamp.valueOf("2009-10-11 12:10:00"),
      Timestamp.valueOf("2009-10-11 12:41:00"),
      Timestamp.valueOf("2009-10-11 12:53:00")))
  }

  test("windowed processStateGlobal folds overlapping cross-key sessions in close order") {
    // Key 0's session stays open PAST key 1's whole session: key 0 events
    // every 8 min from 12:00 to 12:40 (gap 10 keeps one session, closes at
    // last 12:40 + gap); key 1 @ 12:30, 12:31 (closes at 12:31 + gap,
    // earlier). The reference's watermark loop closes key 1 FIRST, so it
    // takes global counter 0 even though key 0's session STARTED first —
    // the global fold must run in session-close (last event time) order,
    // not in the order of whatever eventTime keyFold emits (the head).
    val events = Seq(ev(0, 12, 0), ev(0, 12, 8), ev(0, 12, 16), ev(0, 12, 24),
      ev(0, 12, 32), ev(0, 12, 40), ev(1, 12, 30), ev(1, 12, 31))
    val out = env.fromEvents(events)
      .keyBy(_.value)
      .window(gap10)
      .processStateGlobal((_: Int) => 0, 0)(
        (k, _, evs, kn) => (kn + 1, Seq(evs.head.withValue((k, kn)))))(
        (e, gn) => (gn + 1, Seq(e.withValue((e.value._1, gn)))))
      .collectEvents()
    // (key, global counter): key 1 closed first → counter 0; key 0 → 1.
    assert(out.map(_.value).toSet == Set((1, 0), (0, 1)))
    // the rebuilt event keeps keyFold's own eventTime (the session head)
    assert(out.find(_.value._1 == 0).get.eventTime.get ==
      Timestamp.valueOf("2009-10-11 12:00:00"))
  }

  // --- session store: creation / extension / merge (src/lib.rs:1188-1255) ---
  test("session windows: create, extend, and merge on a bridging event") {
    // 12:00 and 12:16 are two sessions at gap 10; adding 12:08 bridges both.
    def sessions(events: Seq[Event[Int]]): Seq[(Timestamp, Timestamp, Seq[Int])] =
      env.fromEvents(events).keyBy(_ => "k").window(gap10)
        .process((_, b, evs) => Seq(evs.last.withValue(
          (b.start, b.lastEventTime, evs.map(_.value)))))
        .collectValues()
        .map { case (s, l, vs) => (s, l, vs) }.sortBy(_._1.getTime)

    val twoApart = sessions(Seq(ev(1, 12, 0), ev(2, 12, 16)))
    assert(twoApart.map(_._3) == Seq(Seq(1), Seq(2)))

    val bridged = sessions(Seq(ev(1, 12, 0), ev(2, 12, 16), ev(3, 12, 8)))
    assert(bridged == Seq((Timestamp.valueOf("2009-10-11 12:00:00"),
      Timestamp.valueOf("2009-10-11 12:16:00"), Seq(1, 3, 2))))
  }

  test("session windows: event exactly at last + gap starts a new session") {
    val out = env.fromEvents(Seq(ev(1, 12, 0), ev(2, 12, 10)))
      .keyBy(_ => "k").window(gap10)
      .process((_, b, evs) => Seq(evs.head.withValue(evs.map(_.value))))
      .collectValues()
    assert(out.map(_.sorted).sortBy(_.head) == Seq(Seq(1), Seq(2)))
  }

  // --- windowed aggregate (src/lib.rs:1488-1530,:1257-1287) ---
  test("windowed aggregate: separate events → separate windows") {
    val out = env.fromEvents(Seq(ev(1, 12, 10), ev(1, 12, 30)))
      .keyBy(_ => "k").window(gap10)
      .aggregate(_ => 2)(_ + _)
      .collectEvents()
    assert(out.map(_.value) == Seq(2, 2))
  }

  test("windowed aggregate: joined events sum with max timestamps") {
    // reference: events at 12:10 and 12:12, acc |_| 2 → Event(4, 12:12)
    // (src/lib.rs:1508-1530; event_reducer max rule src/lib.rs:639-654)
    val out = env.fromEvents(Seq(ev(1, 12, 10), ev(1, 12, 12)))
      .keyBy(_ => "k").window(gap10)
      .aggregate(_ => 2)(_ + _)
      .collectEvents()
    assert(out.size == 1)
    assert(out.head.value == 4)
    assert(out.head.eventTime.contains(Timestamp.valueOf("2009-10-11 12:12:00")))
    assert(out.head.processingTime == Timestamp.valueOf("2009-10-11 12:12:00"))
  }

  // --- windowed process (src/lib.rs:1316-1382) ---
  test("windowed process receives full window contents in time order") {
    val events = Seq(ev(3, 12, 12), ev(1, 12, 10), ev(2, 12, 11))
    val out = env.fromEvents(events)
      .keyBy(_ => "k").window(gap10)
      .process((_, _, evs) => Seq(evs.head.withValue(evs.map(_.value))))
      .collectValues()
    assert(out == Seq(Seq(1, 2, 3))) // sorted by event time, not arrival
  }

  // --- windowed process_state (src/lib.rs:1384-1486) ---
  test("windowed processState threads state across a key's sessions") {
    val events = Seq(ev(1, 12, 0), ev(2, 12, 1), ev(3, 13, 0))
    val out = env.fromEvents(events)
      .keyBy(_ => "k").window(gap10)
      .processState((_: String) => 0) { (_, _, evs, nSessions) =>
        (nSessions + 1, Seq(evs.head.withValue((nSessions + 1, evs.map(_.value).sum))))
      }
      .collectValues()
    assert(out.sorted == Seq((1, 3), (2, 3))) // session 1 sums 1+2, session 2 sums 3
  }

  // --- split: plain / keyed / windowed (src/lib.rs:1532-1645) ---
  test("split: both branches observe the identical full stream") {
    val (a, b) = env.fromValues(0 until 5).split()
    val filtered = a.filter(_.value % 2 == 0).collectValues().sorted
    val doubled = b.map(e => e.withValue(e.value * 10)).collectValues().sorted
    assert(filtered == Seq(0, 2, 4))
    assert(doubled == Seq(0, 10, 20, 30, 40))
  }

  test("split on keyed and windowed streams preserves keying and windows") {
    val events = Seq(ev(1, 12, 0), ev(2, 12, 1), ev(3, 13, 0))
    val (ka, kb) = env.fromEvents(events).keyBy(_ => "k").split()
    val (wa, wb) = ka.window(gap10).split()
    val counts = wa.aggregate(_ => 1)(_ + _).collectValues().sorted
    val sums = wb.aggregate(identity)(_ + _).collectValues().sorted
    assert(counts == Seq(1, 2))
    assert(sums == Seq(3, 3))
    assert(kb.filter((_, e) => e.value > 1).process((_, e) => Seq(e))
      .collectValues().sorted == Seq(2, 3))
  }

  // --- extension: union (absent from the reference, SURVEY.md §2.2) ---
  test("union merges two streams") {
    val a = env.fromValues(Seq(1, 2))
    val b = env.fromValues(Seq(3))
    assert(a.union(b).collectValues().sorted == Seq(1, 2, 3))
  }

  // --- extension: coGroup fan-in (absent from the reference) ---
  test("coGroup combines two keyed streams per key in time order") {
    val clicks = env.fromEvents(Seq(ev(10, 12, 0), ev(11, 12, 5), ev(20, 13, 0)))
      .keyBy(_.value / 10)
    val buys = env.fromEvents(Seq(ev(100, 12, 30), ev(300, 14, 0)))
      .keyBy(_.value / 100)
    val out = clicks.coGroup(buys) { (k, cs, bs) =>
      Seq(Event.now((k, cs.map(_.value), bs.map(_.value))))
    }.collectValues().sortBy(_._1)
    assert(out == Seq(
      (1, Seq(10, 11), Seq(100)),
      (2, Seq(20), Seq()),
      (3, Seq(), Seq(300))))
  }

  // --- contract: windowed operators require event time (the reference
  // unwrap()s and panics, /root/reference/src/lib.rs:459) ---
  test("windowed ops reject events without eventTime") {
    val e = intercept[Exception] {
      env.fromValues(Seq(1, 2)) // Event.now → eventTime = None
        .keyBy(_ => "k").window(gap10)
        .aggregate(identity[Int])(_ + _)
        .collectEvents()
    }
    def causes(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(causes)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("eventTime"))), e.toString)
  }
}
