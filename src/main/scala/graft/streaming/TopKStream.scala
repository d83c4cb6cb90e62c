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

  /**
   * Approximate per-window state — the documented swap for extreme
   * per-window cardinality: a count-min sketch (d rows × w counters,
   * integer-exact updates) plus a CANDIDATE map capped at `cap`
   * entries. Every arriving token updates the sketch and enters the
   * candidate map at its current CMS estimate; when the map exceeds
   * `cap`, the smallest-estimate entries are dropped (classic
   * sketch + heap heavy hitters). State per open window is
   * d·w + cap regardless of token cardinality. CMS never
   * underestimates, so a true heavy hitter's estimate always reaches
   * the candidate bar — misses need `cap` distinct tokens with higher
   * estimates, impossible for a token above the (cap+1)-th true
   * frequency plus the CMS error εN. Seeds are FIXED — emissions stay
   * deterministic for a given input multiset.
   */
  final case class CmsState(grid: Vector[Long], candidates: Map[String, Long])

  private val CmsD = 4
  private val CmsSeeds = Vector(0x9E3779B97F4A7C15L, 0xC2B2AE3D27D4EB4FL,
    0x165667B19E3779F9L, 0x27D4EB2F165667C5L)

  private def cmsSlot(token: String, row: Int, w: Int): Int = {
    // splitmix-style scramble of the string hash — independent rows
    var h = token.hashCode.toLong ^ CmsSeeds(row)
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    (((h ^ (h >>> 31)) % w + w) % w).toInt
  }

  def cmsEmpty(w: Int): CmsState =
    CmsState(Vector.fill(CmsD * w)(0L), Map.empty)

  /** Add one token; returns the state and the token's new estimate. */
  private def cmsAdd(st: CmsState, token: String, w: Int): (CmsState, Long) = {
    var grid = st.grid
    var est = Long.MaxValue
    var r = 0
    while (r < CmsD) {
      val i = r * w + cmsSlot(token, r, w)
      val v = grid(i) + 1L
      grid = grid.updated(i, v)
      if (v < est) est = v
      r += 1
    }
    (st.copy(grid = grid), est)
  }

  /** Fold a batch of tokens into the sketch + capped candidate map. */
  def mergeApprox(st: CmsState, tokens: Iterator[String], w: Int, cap: Int): CmsState = {
    var s = st
    tokens.foreach { t =>
      val (s2, est) = cmsAdd(s, t, w)
      var cand = s2.candidates.updated(t, est)
      if (cand.size > cap) {
        // drop the lowest-estimate entries (ties by token desc, so the
        // kept set is deterministic); done rarely — once per cap/1 new
        // tokens at steady state
        cand = cand.toSeq.sortBy { case (tok, c) => (-c, tok) }.take(cap).toMap
      }
      s = CmsState(s2.grid, cand)
    }
    s
  }

  /** Top-k of a closed approximate window: estimate desc, token asc. */
  def closeWindowApprox(st: CmsState, k: Int): Seq[(String, Long, Long)] =
    st.candidates.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .zipWithIndex.map { case ((t, c), i) => (t, c, i + 1L) }

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
  /**
   * Approximate variant of [[apply]] — same output schema and close
   * semantics, `cnt` is the CMS estimate (never an underestimate).
   * State per open window is d·w + cap integers/entries regardless of
   * token cardinality — the extreme-cardinality regime where the exact
   * map outgrows the store. FMGWS event-time-timeout backend (the
   * exact path proves backend parity for this operator shape; the
   * sketch state is backend-agnostic kryo bytes either way).
   */
  def approx(events: DataFrame, tsCol: String, tokenCol: String,
             windowSec: Long, k: Int, w: Int = 1024, cap: Int = 256): DataFrame = {
    import org.apache.spark.sql.functions._
    val windowMs = windowSec * 1000L
    val (kk, ww, cc) = (k, w, cap)
    val rows = events.select(
      (expr(s"unix_timestamp($tsCol) div $windowSec") * lit(windowSec * 1000000L))
        .as("window_start"),
      col(tokenCol).cast("string").as("token"), col(tsCol))
    val outEnc = Encoders.row(outSchema)
    implicit val longEnc = Encoders.scalaLong
    val stEnc = Encoders.kryo[CmsState]
    rows.groupByKey((r: Row) => r.getLong(0))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Row], gs: GroupState[CmsState]) =>
          if (gs.hasTimedOut) {
            val st = gs.get
            gs.remove()
            closeWindowApprox(st, kk).iterator.map { case (t, c, r) => Row(key, t, c, r) }
          } else {
            val merged = mergeApprox(if (gs.exists) gs.get else cmsEmpty(ww),
              it.map(_.getString(1)), ww, cc)
            gs.update(merged)
            gs.setTimeoutTimestamp(math.max(key / 1000L + windowMs,
              gs.getCurrentWatermarkMs() + 1))
            Iterator.empty[Row]
          }
      }(stEnc, outEnc)
  }

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
