package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.api.{Event, SessionBounds}

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
  /** One registered timer per key, tracked in `armed` so a superseded
    * timer is DELETED before its replacement registers. Unlike
    * `GroupState.setTimeoutTimestamp` (one timeout, overwritten), TWS
    * `registerTimer` accumulates — without this a key re-arming every
    * batch leaks a backlog of stale timers that all fire (a full state
    * read + rewrite each) on every watermark advance. */
  sealed trait TimerHygiene[K, I, O] extends StatefulProcessor[K, I, O] {
    @transient protected var armed: ValueState[Long] = _

    protected def initTimerState(): Unit =
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)

    /** Ensure exactly the timer at `desiredMs` is registered. */
    protected def rearm(desiredMs: Long): Unit =
      if (!armed.exists() || armed.get() != desiredMs) {
        if (armed.exists()) getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(desiredMs)
        armed.update(desiredMs)
      }

    protected def disarm(): Unit =
      if (armed.exists()) { getHandle.deleteTimer(armed.get()); armed.clear() }

    /** The runtime removes a fired timer itself; forget it so `rearm`/
      * `disarm` don't try to delete it or assume it still covers us. */
    protected def firedTimer(info: ExpiredTimerInfo): Unit =
      if (armed.exists() && armed.get() == info.getExpiryTimeInMs()) armed.clear()
  }

  final class SessionAgg[K, T, U](gapMicros: Long, acc: T => U, combine: (U, U) => U)
      extends StatefulProcessor[K, Event[T], Event[U]] with TimerHygiene[K, Event[T], Event[U]] {
    import StreamingSessions.{mergeAgg, micros, tsOf, OpenAgg}

    @transient private var open: ValueState[List[OpenAgg[U]]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState("open", Encoders.kryo[List[OpenAgg[U]]], TTLConfig.NONE)
      initTimerState()
    }

    /** Close every session the watermark has passed; keep the rest and
      * arm a timer for the earliest pending close. */
    private def closeDue(merged: List[OpenAgg[U]], tv: TimerValues): Iterator[Event[U]] = {
      val wmMicros = tv.getCurrentWatermarkInMs() * 1000L
      val (closed, stillOpen) = merged.partition(_.lastMicros + gapMicros <= wmMicros)
      if (stillOpen.isEmpty) { open.clear(); disarm() }
      else {
        open.update(stillOpen)
        rearm(math.max(
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
      firedTimer(expiredTimerInfo)
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

  /** Streaming counterpart of `WindowedGStream.process` on TWS — the
    * `StreamingSessions.process` semantics (buffer each open session's
    * full contents, close when the watermark passes last+gap) with
    * timer-driven close-out and state cleared when no session is open. */
  final class SessionProcess[K, T, U](gapMicros: Long,
      f: (K, SessionBounds, Seq[Event[T]]) => IterableOnce[Event[U]])
      extends StatefulProcessor[K, Event[T], Event[U]] with TimerHygiene[K, Event[T], Event[U]] {
    import StreamingSessions.{mergeBuf, micros, tsOf, OpenBuf}

    @transient private var open: ValueState[List[OpenBuf[T]]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState("open", Encoders.kryo[List[OpenBuf[T]]], TTLConfig.NONE)
      initTimerState()
    }

    private def closeDue(key: K, merged: List[OpenBuf[T]], tv: TimerValues): Iterator[Event[U]] = {
      val wmMicros = tv.getCurrentWatermarkInMs() * 1000L
      val (closed, stillOpen) = merged.partition(_.lastMicros + gapMicros <= wmMicros)
      if (stillOpen.isEmpty) { open.clear(); disarm() }
      else {
        open.update(stillOpen)
        rearm(math.max(stillOpen.map(s => s.lastMicros + gapMicros).min / 1000L,
          tv.getCurrentWatermarkInMs() + 1L))
      }
      closed.sortBy(_.startMicros).iterator.flatMap { s =>
        val evs = s.events.sortBy(e => micros(e.eventTimeOrThrow))
        f(key, SessionBounds(tsOf(s.startMicros), tsOf(s.lastMicros)), evs)
      }
    }

    override def handleInputRows(key: K, rows: Iterator[Event[T]],
        timerValues: TimerValues): Iterator[Event[U]] = {
      val fresh = rows.map { e =>
        val t = micros(e.eventTimeOrThrow)
        OpenBuf(t, t, e :: Nil)
      }.toList
      closeDue(key,
        mergeBuf((if (open.exists()) open.get() else Nil) ::: fresh, gapMicros),
        timerValues)
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Event[U]] = {
      firedTimer(expiredTimerInfo)
      if (!open.exists()) Iterator.empty
      else closeDue(key, open.get(), timerValues)
    }
  }

  /** Wire [[SessionProcess]] onto a keyed, watermarked event stream. */
  def sessionProcess[K, T, U](ds: Dataset[Event[T]], sel: Event[T] => K, gapMicros: Long,
      f: (K, SessionBounds, Seq[Event[T]]) => IterableOnce[Event[U]])(
      implicit kEnc: Encoder[K], eu: Encoder[Event[U]]): Dataset[Event[U]] =
    ds.groupByKey(sel).transformWithState(
      new SessionProcess[K, T, U](gapMicros, f), TimeMode.EventTime(), OutputMode.Append())

  /** Streaming counterpart of `WindowedGStream.processState` on TWS —
    * `StreamingSessions.processState` semantics: per-key user state
    * threaded across that key's CLOSED sessions in start order; the user
    * state outlives every session (kept even when no session is open,
    * like the reference's per-key HashMap). */
  final class SessionProcessState[K, T, S, U](gapMicros: Long, initS: K => S,
      f: (K, SessionBounds, Seq[Event[T]], S) => (S, Seq[Event[U]]))
      extends StatefulProcessor[K, Event[T], Event[U]] with TimerHygiene[K, Event[T], Event[U]] {
    import StreamingSessions.{mergeBuf, micros, tsOf, KeyedWindowState, OpenBuf}

    @transient private var st: ValueState[KeyedWindowState[S, T]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("st", Encoders.kryo[KeyedWindowState[S, T]], TTLConfig.NONE)
      initTimerState()
    }

    private def closeDue(key: K, prevUser: Option[S], merged: List[OpenBuf[T]],
        tv: TimerValues): Iterator[Event[U]] = {
      val wmMicros = tv.getCurrentWatermarkInMs() * 1000L
      val (closed, stillOpen) = merged.partition(_.lastMicros + gapMicros <= wmMicros)
      var s = prevUser.getOrElse(initS(key))
      val out = closed.sortBy(_.startMicros).flatMap { c =>
        val evs = c.events.sortBy(e => micros(e.eventTimeOrThrow))
        val (s2, o) = f(key, SessionBounds(tsOf(c.startMicros), tsOf(c.lastMicros)), evs, s)
        s = s2
        o
      }
      st.update(KeyedWindowState(Some(s), stillOpen))
      if (stillOpen.nonEmpty)
        rearm(math.max(stillOpen.map(o => o.lastMicros + gapMicros).min / 1000L,
          tv.getCurrentWatermarkInMs() + 1L))
      else disarm()
      out.iterator
    }

    override def handleInputRows(key: K, rows: Iterator[Event[T]],
        timerValues: TimerValues): Iterator[Event[U]] = {
      val prev = if (st.exists()) st.get() else KeyedWindowState[S, T](None, Nil)
      val fresh = rows.map { e =>
        val t = micros(e.eventTimeOrThrow)
        OpenBuf(t, t, e :: Nil)
      }.toList
      closeDue(key, prev.user, mergeBuf(prev.open ::: fresh, gapMicros), timerValues)
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Event[U]] = {
      firedTimer(expiredTimerInfo)
      if (!st.exists()) Iterator.empty
      else {
        val prev = st.get()
        closeDue(key, prev.user, prev.open, timerValues)
      }
    }
  }

  /** Wire [[SessionProcessState]] onto a keyed, watermarked event stream. */
  def sessionProcessState[K, T, S, U](ds: Dataset[Event[T]], sel: Event[T] => K,
      gapMicros: Long, init: K => S,
      f: (K, SessionBounds, Seq[Event[T]], S) => (S, Seq[Event[U]]))(
      implicit kEnc: Encoder[K], eu: Encoder[Event[U]]): Dataset[Event[U]] =
    ds.groupByKey(sel).transformWithState(
      new SessionProcessState[K, T, S, U](gapMicros, init, f),
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
    * data arrives for the key.
    *
    * State layout is what TWS exists for: the buffer is a `ListState`
    * (new arrivals APPEND — O(arrivals) writes per batch; the whole list
    * is read and rewritten only when the watermark actually releases
    * events), the user fold state and the min buffered event time are
    * small `ValueState`s. A `ValueState[List[...]]` here would pay a
    * full deserialize+reserialize of the entire horizon every batch. */
  final class OrderedKeyedFold[K, T, S, U](initS: K => S,
      f: (K, Event[T], S) => (S, Seq[Event[U]]), sEnc: Encoder[S])
      extends StatefulProcessor[K, Event[T], Event[U]] with TimerHygiene[K, Event[T], Event[U]] {
    import StreamingSessions.micros

    @transient private var user: ValueState[S] = _
    @transient private var buf: ListState[Event[T]] = _
    @transient private var minBuf: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      user = getHandle.getValueState("user", sEnc, TTLConfig.NONE)
      buf = getHandle.getListState("buf", Encoders.kryo[Event[T]], TTLConfig.NONE)
      minBuf = getHandle.getValueState[Long]("minBuf", Encoders.scalaLong, TTLConfig.NONE)
      initTimerState()
    }

    private def toArr(es: List[Event[T]]): Array[Event[T]] =
      es.toArray(scala.reflect.ClassTag(classOf[Event[_]]).asInstanceOf[scala.reflect.ClassTag[Event[T]]])

    /** Buffer min + the timer that will release it. */
    private def trackPending(minMicros: Long, tv: TimerValues): Unit = {
      minBuf.update(minMicros)
      rearm(math.max(minMicros / 1000L, tv.getCurrentWatermarkInMs() + 1L))
    }

    /** Read + rewrite the whole buffer: only on batches where the
      * watermark has actually released something. */
    private def drain(key: K, fresh: List[Event[T]], wmMicros: Long,
        tv: TimerValues): Iterator[Event[U]] = {
      val all = buf.get().foldLeft(List.newBuilder[Event[T]])(_ += _).result() ::: fresh
      val (ready, pending) = all.partition(e => micros(e.eventTimeOrThrow) < wmMicros)
      var s = if (user.exists()) user.get() else initS(key)
      val out = ready
        .sortBy(e => (micros(e.eventTimeOrThrow), e.processingTime.getTime))
        .flatMap { e => val (s2, o) = f(key, e, s); s = s2; o }
      user.update(s)
      buf.clear()
      if (pending.nonEmpty) {
        buf.put(toArr(pending))
        trackPending(pending.map(e => micros(e.eventTimeOrThrow)).min, tv)
      } else { minBuf.clear(); disarm() }
      out.iterator
    }

    override def handleInputRows(key: K, rows: Iterator[Event[T]],
        timerValues: TimerValues): Iterator[Event[U]] = {
      val fresh = rows.toList
      val wmMicros = timerValues.getCurrentWatermarkInMs() * 1000L
      val bufMin = if (minBuf.exists()) minBuf.get() else Long.MaxValue
      if (bufMin < wmMicros || fresh.exists(e => micros(e.eventTimeOrThrow) < wmMicros))
        drain(key, fresh, wmMicros, timerValues)
      else {
        // nothing released: append-only, O(arrivals) state I/O
        if (fresh.nonEmpty) {
          buf.appendList(toArr(fresh))
          trackPending(math.min(bufMin, fresh.map(e => micros(e.eventTimeOrThrow)).min),
            timerValues)
        }
        Iterator.empty
      }
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Event[U]] = {
      firedTimer(expiredTimerInfo)
      val wmMicros = timerValues.getCurrentWatermarkInMs() * 1000L
      if (minBuf.exists() && minBuf.get() < wmMicros) drain(key, Nil, wmMicros, timerValues)
      else {
        // fired but the watermark still hasn't passed the earliest
        // buffered event (we armed at wm+1): re-arm for the next advance
        if (minBuf.exists()) trackPending(minBuf.get(), timerValues)
        Iterator.empty
      }
    }
  }

  /** Wire the facade keyed fold onto `transformWithState`; `ordered`
    * selects the watermark-buffered variant (requires a watermark). */
  def keyedProcessState[K, T, S, U](ds: Dataset[Event[T]], sel: Event[T] => K,
      init: K => S, f: (K, Event[T], S) => (S, Seq[Event[U]]), ordered: Boolean)(
      implicit kEnc: Encoder[K], es: Encoder[S], eu: Encoder[Event[U]]): Dataset[Event[U]] =
    ds.groupByKey(sel).transformWithState(
      if (ordered) new OrderedKeyedFold[K, T, S, U](init, f, es)
      else new KeyedFold[K, T, S, U](init, f, es),
      if (ordered) TimeMode.EventTime() else TimeMode.None(),
      OutputMode.Append())
}
