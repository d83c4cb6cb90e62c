package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}
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
}
