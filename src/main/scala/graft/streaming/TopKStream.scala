package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/**
 * Streaming per-window top-k ("trending tokens"): exact top-k values by
 * count within each tumbling event-time window, emitted once when the
 * watermark closes the window — the trending-detection surface a batch
 * engine only gets after the fact.
 *
 * Why ONE stateful stage: the natural two-stage form (windowed count
 * aggregation → per-window top-k) is illegal in Spark — a
 * group-with-state operator cannot follow an aggregation in append
 * mode — so the counts live in this operator's own keyed state (key =
 * window start). That is also the honest cost statement: exact
 * streaming top-k holds the full value-count map per OPEN window;
 * state is bounded by (values per window) × (open windows per key
 * horizon), evicted at close, NOT by stream length. The
 * [[GapFillStream]] conventions apply: pure [[merge]]/[[closeWindow]]
 * core shared by both backends, stored-timer bookkeeping, event-time
 * timers.
 *
 * Output: (window_start µs, token, cnt, rank 1..k), ties broken by
 * token ascending — a total order, so emissions are deterministic and
 * TopKStreamSpec pins them row-identical to the batch
 * tumbling + top-k composition.
 */
object TopKStream {

  /** Fold a batch of tokens into the window's count map. */
  def merge(counts: Map[String, Long], tokens: Iterator[String]): Map[String, Long] =
    tokens.foldLeft(counts)((m, t) => m.updated(t, m.getOrElse(t, 0L) + 1L))

  /** Top-k rows of a closed window: count desc, token asc, rank 1..k. */
  def closeWindow(counts: Map[String, Long], k: Int): Seq[(String, Long, Long)] =
    counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .zipWithIndex.map { case ((t, c), i) => (t, c, i + 1L) }

  private val outSchema = StructType(Seq(
    StructField("window_start", LongType), StructField("token", StringType),
    StructField("cnt", LongType), StructField("rank", LongType)))

  /** TWS backend: one (map, registeredTimer) value per open window. */
  private final class TopKTws(windowMs: Long, k: Int)
      extends StatefulProcessor[Long, Row, Row] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[(Map[String, Long], Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("topk", Encoders.kryo[(Map[String, Long], Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val (prev, timer) =
        if (st.exists()) st.get()
        else (Map.empty[String, Long], -1L)
      val merged = merge(prev, rows.map(_.getString(1)))
      if (timer < 0) {
        // close at window end, clamped past the current watermark
        val exp = math.max(key / 1000L + windowMs,
          timerValues.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(exp)
        st.update((merged, exp))
      } else st.update((merged, timer))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      if (!st.exists() || expiredTimerInfo.getExpiryTimeInMs() != st.get()._2)
        return Iterator.empty
      val counts = st.get()._1
      st.clear()
      closeWindow(counts, k).iterator.map { case (t, c, r) => Row(key, t, c, r) }
    }
  }

  /**
   * Wire the stream: `events` must declare a watermark on `tsCol`.
   * `window_start` is the tumbling window's start in epoch MICROS
   * (µs-portable, the SessionBounds convention).
   */
  def apply(events: DataFrame, tsCol: String, tokenCol: String,
            windowSec: Long, k: Int, useTws: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions._
    val windowMs = windowSec * 1000L
    val kk = k
    val rows = events.select(
      (expr(s"unix_timestamp($tsCol) div $windowSec") * lit(windowSec * 1000000L))
        .as("window_start"),
      col(tokenCol).cast("string").as("token"), col(tsCol))
    val outEnc = Encoders.row(outSchema)
    implicit val longEnc = Encoders.scalaLong
    if (useTws)
      rows.groupByKey((r: Row) => r.getLong(0))
        .transformWithState(new TopKTws(windowMs, kk),
          TimeMode.EventTime(), OutputMode.Append())(outEnc)
    else {
      val stEnc = Encoders.kryo[Map[String, Long]]
      rows.groupByKey((r: Row) => r.getLong(0))
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (key: Long, it: Iterator[Row], gs: GroupState[Map[String, Long]]) =>
            if (gs.hasTimedOut) {
              val counts = gs.get
              gs.remove()
              closeWindow(counts, kk).iterator.map { case (t, c, r) => Row(key, t, c, r) }
            } else {
              val merged = merge(if (gs.exists) gs.get else Map.empty,
                it.map(_.getString(1)))
              gs.update(merged)
              // re-arm on EVERY invocation (NearDupState:187)
              gs.setTimeoutTimestamp(math.max(key / 1000L + windowMs,
                gs.getCurrentWatermarkMs() + 1))
              Iterator.empty[Row]
            }
        }(stEnc, outEnc)
    }
  }
}
