package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.api.Event

/**
 * Keyed running state on Spark 4's `transformWithState` — the successor
 * API to `flatMapGroupsWithState` (typed state variables, TTL, timers,
 * RocksDB-backed). Functionally equivalent to
 * `KeyedGStream.processState` for the running-count shape; kept as the
 * forward-looking variant: at 100 TB state scale the RocksDB provider +
 * per-variable state layout is the configuration this API is built for.
 *
 * Note: `transformWithState` requires
 * `spark.sql.streaming.stateStore.providerClass =
 * ...RocksDBStateStoreProvider` on the session running the query.
 */
object Tws {

  /** Per-key running count, emitting (key, count-so-far) per event. */
  final class RunningCount[K] extends StatefulProcessor[K, Event[Long], (K, Long, Long)] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[Event[Long]],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(K, Long, Long)] = {
      var n = if (count.exists()) count.get() else 0L
      val out = rows.toSeq
        .sortBy(e => (e.eventTime.map(_.getTime), e.processingTime.getTime))
        .map { e => n += 1; (key, e.value, n) }
      count.update(n)
      out.iterator
    }
  }

  /** Wire the processor onto a keyed event stream. */
  def runningCount[K](ds: Dataset[Event[Long]], sel: Event[Long] => K)(
      implicit kEnc: Encoder[K], outEnc: Encoder[(K, Long, Long)]): Dataset[(K, Long, Long)] =
    ds.groupByKey(sel)
      .transformWithState(new RunningCount[K], TimeMode.None(), OutputMode.Append())

  /**
   * Event-time session aggregation on `transformWithState` — the same
   * merge-sweep + watermark close-out as `StreamingSessions.aggregate`
   * (whose helpers it reuses), but with state in a typed `ValueState`
   * variable and close-out driven by REGISTERED EVENT-TIME TIMERS rather
   * than a per-group timeout. At large state scale this is the intended
   * configuration: RocksDB-backed state variables, per-key timers, TTL
   * support.
   */
  final class SessionAgg[K, T, U](gapMicros: Long, acc: T => U, combine: (U, U) => U)
      extends StatefulProcessor[K, Event[T], Event[U]] {
    import StreamingSessions.{mergeAgg, micros, tsOf, OpenAgg}

    @transient private var open: ValueState[List[OpenAgg[U]]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.kryo[List[OpenAgg[U]]], TTLConfig.NONE)

    /** Close every session the watermark has passed; keep the rest and
      * arm a timer for the earliest pending close. */
    private def closeDue(merged: List[OpenAgg[U]], tv: TimerValues): Iterator[Event[U]] = {
      val wmMicros = tv.getCurrentWatermarkInMs() * 1000L
      val (closed, stillOpen) = merged.partition(_.lastMicros + gapMicros <= wmMicros)
      if (stillOpen.isEmpty) open.clear()
      else {
        open.update(stillOpen)
        getHandle.registerTimer(math.max(
          stillOpen.map(s => s.lastMicros + gapMicros).min / 1000L,
          tv.getCurrentWatermarkInMs() + 1L))
      }
      closed.sortBy(_.startMicros).iterator.map(s =>
        Event(new Timestamp(s.maxProcMillis), Some(tsOf(s.lastMicros)), s.value))
    }

    override def handleInputRows(key: K, rows: Iterator[Event[T]],
        timerValues: TimerValues): Iterator[Event[U]] = {
      val fresh = rows.map { e =>
        val t = micros(e.eventTimeOrThrow)
        OpenAgg(t, t, e.processingTime.getTime, acc(e.value))
      }.toList
      val prev = if (open.exists()) open.get() else Nil
      closeDue(mergeAgg(prev ::: fresh, gapMicros, combine), timerValues)
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Event[U]] = {
      if (!open.exists()) Iterator.empty
      else closeDue(open.get(), timerValues)
    }
  }

  /** Wire [[SessionAgg]] onto a keyed, watermarked event stream. */
  def sessionAggregate[K, T, U](ds: Dataset[Event[T]], sel: Event[T] => K,
      gapMicros: Long, acc: T => U, combine: (U, U) => U)(
      implicit kEnc: Encoder[K], eu: Encoder[Event[U]]): Dataset[Event[U]] =
    ds.groupByKey(sel).transformWithState(
      new SessionAgg[K, T, U](gapMicros, acc, combine),
      TimeMode.EventTime(), OutputMode.Append())

  /** The generic facade keyed fold (`KeyedGStream.processState`
    * semantics, per-batch form) as a `StatefulProcessor`: each
    * micro-batch folds time-sorted through the user state held in a
    * typed `ValueState`. */
  final class KeyedFold[K, T, S, U](initS: K => S,
      f: (K, Event[T], S) => (S, Seq[Event[U]]), sEnc: Encoder[S])
      extends StatefulProcessor[K, Event[T], Event[U]] {
    @transient private var st: ValueState[S] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("s", sEnc, TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[Event[T]],
        timerValues: TimerValues): Iterator[Event[U]] = {
      var s = if (st.exists()) st.get() else initS(key)
      val out = rows.toSeq
        .sortBy(e => (e.eventTime.map(_.getTime), e.processingTime.getTime))
        .flatMap { e => val (s2, o) = f(key, e, s); s = s2; o }
      st.update(s)
      out.iterator
    }
  }

  /** The watermark-ordered facade keyed fold
    * (`StreamingSessions.keyedProcessState` semantics) as a
    * `StatefulProcessor`: events buffer until the watermark strictly
    * passes their event time, then fold in (eventTime, processingTime)
    * order; a registered event-time timer drains the buffer when no new
    * data arrives for the key. */
  final class OrderedKeyedFold[K, T, S, U](initS: K => S,
      f: (K, Event[T], S) => (S, Seq[Event[U]]))
      extends StatefulProcessor[K, Event[T], Event[U]] {
    import StreamingSessions.{micros, OrderedKeyState}

    @transient private var st: ValueState[OrderedKeyState[S, T]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("s", Encoders.kryo[OrderedKeyState[S, T]], TTLConfig.NONE)

    private def fold(key: K, fresh: List[Event[T]], tv: TimerValues): Iterator[Event[U]] = {
      val prev = if (st.exists()) st.get() else OrderedKeyState[S, T](None, Nil)
      val all = prev.buffered ::: fresh
      val wmMicros = tv.getCurrentWatermarkInMs() * 1000L
      val (ready, pending) = all.partition(e => micros(e.eventTimeOrThrow) < wmMicros)
      var s = prev.user.getOrElse(initS(key))
      val out = ready
        .sortBy(e => (micros(e.eventTimeOrThrow), e.processingTime.getTime))
        .flatMap { e => val (s2, o) = f(key, e, s); s = s2; o }
      st.update(OrderedKeyState(Some(s), pending))
      if (pending.nonEmpty)
        getHandle.registerTimer(math.max(
          pending.map(e => micros(e.eventTimeOrThrow)).min / 1000L,
          tv.getCurrentWatermarkInMs() + 1L))
      out.iterator
    }

    override def handleInputRows(key: K, rows: Iterator[Event[T]],
        timerValues: TimerValues): Iterator[Event[U]] =
      fold(key, rows.toList, timerValues)

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Event[U]] =
      fold(key, Nil, timerValues)
  }

  /** Wire the facade keyed fold onto `transformWithState`; `ordered`
    * selects the watermark-buffered variant (requires a watermark). */
  def keyedProcessState[K, T, S, U](ds: Dataset[Event[T]], sel: Event[T] => K,
      init: K => S, f: (K, Event[T], S) => (S, Seq[Event[U]]), ordered: Boolean)(
      implicit kEnc: Encoder[K], es: Encoder[S], eu: Encoder[Event[U]]): Dataset[Event[U]] =
    ds.groupByKey(sel).transformWithState(
      if (ordered) new OrderedKeyedFold[K, T, S, U](init, f)
      else new KeyedFold[K, T, S, U](init, f, es),
      if (ordered) TimeMode.EventTime() else TimeMode.None(),
      OutputMode.Append())
}
