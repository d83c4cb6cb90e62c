package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/**
 * In-horizon streaming near-duplicate detection: the stateful per-band
 * stages behind `Dedup.nearDupKeptStreamStateful`. Closes the scope gap
 * of the anti-join-only path (`Dedup.nearDupKeptStream`): two NEAR-dups
 * (shared LSH band, different full signature) arriving within one
 * horizon — even in the SAME micro-batch — now resolve to
 * first-arrival-wins, the scalable form of the reference's keyed-state
 * pattern (/root/reference/src/lib.rs:323-361).
 *
 * Everything here is EVENT-time driven. Processing-time timeouts/TTL
 * are deliberately avoided: a stateful operator with processing-time
 * semantics reports `shouldRunAnotherBatch=true` unconditionally, so a
 * zero-interval trigger busy-loops empty micro-batches re-executing the
 * whole plan (measured: >21k stages in 13 min on a 6-row test stream).
 * Event-time timers fire only on watermark advance — the engine stays
 * idle between arrivals, exactly like Spark's own windowed aggregates.
 *
 * Two keyed stateful stages, both shuffling on narrow string keys
 * (never on document text), downstream of an exact-dup
 * `dropDuplicatesWithinWatermark` on the full signature (which is what
 * lets RESOLVE hold zero state — a signature reaches it at most once
 * in-horizon):
 *
 *  - CLAIM, keyed on `(band_idx | band_hash)`: the first arrival
 *    (event-time order, full-signature tiebreak) becomes the band's
 *    owner; every row reports whether its document is that owner.
 *    Ownership lasts `horizonMs` of EVENT time after the owner's own
 *    event time — enforced lazily on access (exact, independent of
 *    batch boundaries) and by an event-time timer for storage eviction.
 *    Ownership persisting across batches means a near-dup of ANY
 *    in-horizon predecessor loses its shared band — including
 *    predecessors that were themselves dropped, the same transitive
 *    (connected-component) semantics as the batch cascade's cluster
 *    collapse.
 *  - RESOLVE, keyed on the full signature: a document's band rows all
 *    land in one invocation (they derive from one input row, and the
 *    upstream exact-dedup guarantees one doc per signature in-horizon);
 *    emit the payload iff every band row won its claim. No state.
 *
 * State is bounded: the exact-dedup stage holds one row per in-horizon
 * signature (watermark-evicted by Spark), CLAIM one (owner, eventTime)
 * pair per distinct in-horizon band hash (timer-evicted), RESOLVE
 * nothing. At 100 TB ingest rates state scales with the horizon's
 * distinct-band cardinality, not the corpus — the corpus lives in the
 * static `seenBands` side. Per-invocation memory is bounded by one
 * key's rows within one micro-batch (exact duplicates already collapsed
 * upstream); a pathological near-identical flood concentrating on one
 * band key is bounded by micro-batch sizing (`maxFilesPerTrigger` /
 * `maxOffsetsPerTrigger`), the standard knob for every keyed stateful
 * operator.
 */
object NearDupState {

  private def claimOutSchema(payload: StructType) = StructType(Seq(
    StructField("sigfull", StringType, nullable = false),
    StructField("ord", LongType, nullable = true),
    StructField("winner", BooleanType, nullable = false),
    StructField("payload", payload, nullable = false)))

  /** Claim decision shared by both backends: given the stored owner (or
    * null) and this batch's rows sorted by (ord, sig), compute winner
    * flags and the new owner. Ownership expires `horizonMs` after the
    * OWNER's event time (micros), so a doc arriving past that is a new
    * owner, not a loser — exact horizon semantics regardless of when
    * the eviction timer actually fires. */
  private def claim(rows: Seq[Row], own0: (String, Long), horizonMs: Long,
                    outSchema: StructType): (Seq[Row], (String, Long)) = {
    var own = own0
    val out = rows.sortBy(r => (r.getLong(2), r.getString(1))).map { r =>
      val sig = r.getString(1)
      val ord = r.getLong(2)
      if (own == null || ord - own._2 > horizonMs * 1000L) own = (sig, ord)
      new GenericRowWithSchema(
        Array[Any](sig, ord, own._1 == sig, r.getStruct(3)), outSchema): Row
    }
    (out, own)
  }

  /** First-arrival-wins per band key (transformWithState backend).
    * Input rows: (bkey, sigfull, ord, payload); emits
    * (sigfull, ord, winner, payload). Event-time timer evicts the
    * ownership record once the watermark passes its horizon. State is
    * (owner sig, owner ord µs, REGISTERED timer ms): the registered
    * expiry may have been clamped to watermark+1 at registration time,
    * so a later deleteTimer must delete the STORED value — recomputing
    * it against the then-current watermark would miss the clamped timer
    * and leak it (harmless semantically thanks to the expiry guard, but
    * an orphan per re-claimed band adds up at ingest rates). */
  private final class ClaimTws(payload: StructType, horizonMs: Long)
      extends StatefulProcessor[String, Row, Row] {
    @transient private var owner: ValueState[(String, Long, Long)] = _
    private val outSchema = claimOutSchema(payload)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[(String, Long, Long)]("owner",
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def expiryMs(ordMicros: Long, tv: TimerValues): Long =
      math.max(ordMicros / 1000L + horizonMs, tv.getCurrentWatermarkInMs() + 1)

    override def handleInputRows(key: String, rows: Iterator[Row],
        timerValues: TimerValues): Iterator[Row] = {
      val stored = if (owner.exists()) owner.get() else null
      val before = if (stored == null) null else (stored._1, stored._2)
      val (out, after) = claim(rows.toSeq, before, horizonMs, outSchema)
      if (!(after eq before)) {
        if (stored != null) getHandle.deleteTimer(stored._3)
        val exp = expiryMs(after._2, timerValues)
        owner.update((after._1, after._2, exp))
        getHandle.registerTimer(exp)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Row] = {
      // only the timer registered for the CURRENT owner may evict — an
      // exact match on the stored registration, so a stale timer from a
      // superseded owner (already deleted above, but belt-and-braces)
      // can never clear a fresher claim
      if (owner.exists() && expiredTimerInfo.getExpiryTimeInMs() == owner.get()._3)
        owner.clear()
      Iterator.empty
    }
  }

  /**
   * Wire the stages onto a pre-banded, already exact-deduped frame.
   * `banded` must carry `__sigfull` plus `__band0..__band{bands-1}`
   * (nullable), a LongType `__ord` event-time surrogate in MICROS, and
   * the original payload columns `payloadCols`; its plan must declare a
   * watermark (the claim stage's timers are event-time driven).
   */
  def apply(banded: DataFrame, payloadCols: Seq[String], tsCol: String,
            bands: Int, horizonMs: Long, useTws: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    val payloadSchema = StructType(
      banded.schema.fields.filter(f => payloadCols.contains(f.name)))
    // one claim row per non-null band; short docs (all bands null) get a
    // single pseudo-band keyed on their own raw-content signature, so
    // they dedup exactly among themselves (and only themselves)
    val bandKeys = (0 until bands).map(b =>
      when(col(s"__band$b").isNotNull, concat(lit(s"$b|"), col(s"__band$b"))))
    val keys = array_compact(array(bandKeys: _*))
    val rows = banded.select(
      explode(when(size(keys) > 0, keys)
        .otherwise(array(concat(lit("raw|"), col("__sigfull"))))).as("__bkey"),
      col("__sigfull"),
      col("__ord"),
      struct(payloadCols.map(col): _*).as("__p"),
      // the watermarked event-time column must stay a TOP-LEVEL attribute
      // of the claim stage's input: flatMapGroupsWithState's event-time-
      // timeout check looks for the watermark tag on the input schema,
      // and a column packed inside the payload struct loses it
      col(tsCol))

    val horizon = horizonMs // local copy: keep `this` out of FMGWS closures
    val claimSchema = claimOutSchema(payloadSchema)
    val claimEnc = Encoders.row(claimSchema)
    val outEnc = Encoders.row(payloadSchema)
    implicit val strEnc = Encoders.STRING
    val ownEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    val claimed =
      if (useTws)
        rows.groupByKey((r: Row) => r.getString(0))
          .transformWithState(new ClaimTws(payloadSchema, horizon),
            TimeMode.EventTime(), OutputMode.Append())(claimEnc)
      else
        rows.groupByKey((r: Row) => r.getString(0))
          .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
            (key: String, it: Iterator[Row], gs: GroupState[(String, Long)]) =>
              if (gs.hasTimedOut) { gs.remove(); Iterator.empty }
              else {
                val before = if (gs.exists) gs.get else null
                val (out, after) = claim(it.toSeq, before, horizon, claimSchema)
                if (!(after eq before)) gs.update(after)
                // re-arm on EVERY invocation, not just on a claim: Spark
                // clears a group's timeout whenever the function fires for
                // it, so a loser row arriving for this band would silently
                // cancel the owner's eviction and leak the state
                if (gs.exists)
                  gs.setTimeoutTimestamp(math.max(gs.get._2 / 1000L + horizon,
                    gs.getCurrentWatermarkMs() + 1))
                out.iterator
              }
          }(ownEnc, claimEnc)
    // RESOLVE holds no state — the stateful-operator form is only the
    // legal way to group a streaming doc's band rows back together
    if (useTws)
      claimed.groupByKey((r: Row) => r.getString(0))
        .transformWithState(new StatefulProcessor[String, Row, Row] {
          override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()
          override def handleInputRows(key: String, rows: Iterator[Row],
              timerValues: TimerValues): Iterator[Row] = resolve(rows)
        }, TimeMode.None(), OutputMode.Append())(outEnc)
    else
      claimed.groupByKey((r: Row) => r.getString(0))
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (key: String, it: Iterator[Row], gs: GroupState[Boolean]) => resolve(it)
        }(Encoders.scalaBoolean, outEnc)
  }

  /** Emit the payload once iff every band row won its claim. */
  private def resolve(rows: Iterator[Row]): Iterator[Row] = {
    val rs = rows.toSeq
    if (rs.forall(_.getBoolean(2))) Iterator.single(rs.head.getStruct(3)) else Iterator.empty
  }
}
