package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stream-stream joins — a capability entirely absent from the reference
 * (its DSL is a single chain; two streams cannot be combined at all,
 * /root/reference/src/lib.rs has no join surface — SURVEY.md §2.2).
 *
 * Spark's StreamingSymmetricHashJoin gives the scalable shape for free
 * once the query has (a) an equi-key — both sides hash-partition on it,
 * so state is distributed, never per-executor-global — and (b) a time
 * bound plus watermarks on both sides, so rows provably past matching
 * range are evicted: state is horizon-bounded, not stream-bounded. That
 * is the ONLY join shape that survives an unbounded 100 TB/day stream.
 */
object StreamJoins {

  /**
   * Pairs (a, b) with equal `keyCol` where `a_ts < b_ts <= a_ts +
   * horizon` — the streaming twin of
   * [[graft.operators.RangeJoin.follows]], same output schema
   * (keyCol, a_id, a_ts, b_id, b_ts), proven row-identical to it in
   * StreamStreamJoinSpec.
   *
   * Streaming use: both inputs must carry `withWatermark` on `tsCol`
   * BEFORE this call (the watermark tag survives the internal renames —
   * it is column metadata, carried through alias). Join state then holds
   * only rows younger than horizon + watermark delay per side.
   *
   * Batch use: the same predicate works, but prefer RangeJoin.follows —
   * its time-bucketed equi-join bounds candidate pairs by
   * events-per-horizon, where this raw predicate form materializes
   * per-key cross products before the time filter. In streaming that
   * hazard does not exist: the symmetric hash join probes per-row as
   * micro-batches arrive, against state already pruned to the horizon.
   */
  def follows(left: DataFrame, right: DataFrame, keyCol: String,
              tsCol: String, idCol: String, horizon: String): DataFrame = {
    val a = left.select(col(keyCol), col(tsCol).as("a_ts"), col(idCol).as("a_id"))
    val b = right.select(col(keyCol).as("__bk"), col(tsCol).as("b_ts"),
      col(idCol).as("b_id"))
    a.join(b,
        col(keyCol) === col("__bk") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizon"))
      .select(col(keyCol), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
  }

  /**
   * Left-outer [[follows]]: every left row appears — paired with each
   * right match in `(a_ts, a_ts + horizon]`, or once with null
   * b_id/b_ts if nothing matched. The "which views never converted"
   * question, which the inner join silently drops.
   *
   * Streaming: Spark emits the null-padded row only once the LEFT
   * watermark passes a_ts + horizon (before that a match could still
   * arrive) — so unmatched results trail the event by horizon + delay,
   * and a final empty micro-batch may be needed to flush the tail
   * (StreamStreamJoinSpec pushes a sentinel event for exactly this).
   * Same state bound as the inner form.
   *
   * Batch: same predicate, same per-key-cross-product caveat as
   * [[follows]] — at scale compose RangeJoin.follows with an anti-join
   * union instead (the t21 declared plan does; proven identical there).
   */
  def followsLeftOuter(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, idCol: String, horizon: String): DataFrame = {
    val a = left.select(col(keyCol), col(tsCol).as("a_ts"), col(idCol).as("a_id"))
    val b = right.select(col(keyCol).as("__bk"), col(tsCol).as("b_ts"),
      col(idCol).as("b_id"))
    a.join(b,
        col(keyCol) === col("__bk") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col(keyCol), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
  }

  /**
   * Full-outer [[follows]], completing the t20/t21 family: matched
   * pairs, plus each unmatched left row null-padded on the right, plus
   * each unmatched right row null-padded on the left — attribution
   * COMPLETENESS ("every view and every click accounted for exactly
   * once or as a pair"). `keyCol` coalesces across sides, so it is
   * non-null on every output row.
   *
   * Streaming: null rows for a side emit once that side's watermark
   * clears the possibility of a match (left at a_ts + horizon, right at
   * b_ts — a click strictly after all in-horizon views can match
   * nothing older once its own time passes the left watermark); same
   * horizon-bounded state as the inner form, same sentinel-flush caveat
   * as [[followsLeftOuter]]. Batch: prefer the t24 declared
   * composition (bucketed inner + two anti-join unions).
   */
  /**
   * SCD-2 temporal enrichment: each event joins the dimension VERSION
   * valid at its event time (`key` equal and `from ≤ ts < to`) — the
   * "which price/segment/config applied when this happened" join that
   * a plain key join silently gets wrong the moment a dimension
   * changes. With explicit validity intervals this is STATELESS — an
   * equi-join on the key plus a range filter, so it broadcasts on a
   * stream exactly like a static enrichment (no watermark on the
   * dimension side, no join state); versions are non-overlapping per
   * key, so each event matches at most one row. The interval-free
   * variant (derive validity from effective-dates only) is batch
   * [[graft.operators.AsOfJoin.lastValueAsOf]] (r8). `how` = "inner"
   * drops events predating every version; "left_outer" keeps them
   * null-padded.
   */
  def enrichAsOf(events: DataFrame, dim: DataFrame, eventKey: String,
                 tsCol: String, dimKey: String, fromCol: String,
                 toCol: String, how: String = "inner"): DataFrame =
    events.join(broadcast(dim),
      events(eventKey) === dim(dimKey) &&
        events(tsCol) >= dim(fromCol) && events(tsCol) < dim(toCol),
      how)

  def followsFullOuter(left: DataFrame, right: DataFrame, keyCol: String,
                       tsCol: String, idCol: String, horizon: String): DataFrame = {
    val a = left.select(col(keyCol), col(tsCol).as("a_ts"), col(idCol).as("a_id"))
    val b = right.select(col(keyCol).as("__bk"), col(tsCol).as("b_ts"),
      col(idCol).as("b_id"))
    a.join(b,
        col(keyCol) === col("__bk") &&
          col("b_ts") > col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizon"),
        "full_outer")
      .select(coalesce(col(keyCol), col("__bk")).as(keyCol),
        col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
  }
}
