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
}
