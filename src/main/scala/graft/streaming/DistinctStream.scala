package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Windowed distinct counting — "distinct users per hour" — on batch
 * AND unbounded streams (north-star extension; the reference has one
 * window type and no distinct aggregation at all,
 * /root/reference/src/lib.rs:395-905).
 *
 * The streaming form cannot be the batch form: Spark rejects
 * `countDistinct` in a streaming aggregation outright. The supported
 * composition is TWO chained stateful operators (legal in append mode
 * since multi-stateful-operator support):
 *
 *   1. `dropDuplicates` on (window, id) where `window` is the
 *      WATERMARKED time-window struct — state holds one row per
 *      distinct (window, id) pair and evicts per window as the
 *      watermark closes it (dedup state keyed on an event-time column
 *      is the documented bounded-state form; the
 *      `dropDuplicatesWithinWatermark` variant would be WRONG here —
 *      it guarantees dedup only for duplicates arriving within the
 *      watermark DELAY of each other, so same-window duplicates
 *      spanning micro-batches re-admit once the watermark passes the
 *      first arrival). Duplicate arrivals die here, so
 *   2. the downstream windowed `count(*)` IS the distinct count, with
 *      normal watermark-close append semantics.
 *
 * State bound: distinct pairs per open window + the aggregation's open
 * windows — rate-bounded, never stream-bounded (the stream-join
 * horizon argument; probed in StreamJoinProbe's harness family). At
 * extreme cardinality the documented swap is `approx_count_distinct`
 * (sketch state, no dedup stage) or the mergeable
 * [[graft.operators.CorpusStats]] HLL shard sketches.
 *
 * Batch twin: plain `countDistinct` per tumbling window — Catalyst
 * rewrites the single distinct aggregate to a two-phase agg (no
 * Expand). DistinctStreamSpec proves the streaming emissions
 * row-identical to the batch twin once windows close.
 *
 * Output: (window_start epoch-µs, n_distinct) — the SessionBounds
 * µs-portable convention.
 */
object DistinctStream {

  /** Batch form (also the oracle shape for t26). */
  def batch(events: DataFrame, tsCol: String, idCol: String,
            windowSec: Long): DataFrame =
    events.groupBy(
        (expr(s"unix_timestamp($tsCol) div $windowSec") * lit(windowSec * 1000000L))
          .as("window_start"))
      .agg(countDistinct(col(idCol)).as("n_distinct"))

  /** Streaming form: `events` must already carry `withWatermark` on
    * `tsCol`. Emissions appear when the watermark closes the window. */
  def stream(events: DataFrame, tsCol: String, idCol: String,
             windowSec: Long): DataFrame =
    events.select(
        window(col(tsCol), s"$windowSec seconds").as("window"),
        col(idCol).cast("string").as("__id"))
      .dropDuplicates("window", "__id")
      .groupBy(col("window"))
      .agg(count(lit(1)).as("n_distinct"))
      .select((unix_timestamp(col("window.start")) * 1000000L).as("window_start"),
        col("n_distinct"))

  /** The extreme-cardinality swap the scaladoc above promises, as a
    * real code path: ONE stateful windowed aggregation whose state per
    * open window is a single HyperLogLog++ sketch row (~1.04/rsd²
    * 6-bit registers — ~14 KB at the default 1% rsd), INDEPENDENT of
    * how many distinct ids the window sees — where [[stream]]'s dedup
    * stage holds one state row per distinct (window, id) pair. No
    * dedup stage at all: HLL absorbs duplicates by construction, and
    * the sketch buffer is mergeable so map-side partial aggregation
    * still applies. Trade: the count is approximate (relative standard
    * deviation `rsd`) and the emission carries that name so callers
    * can't mistake it for exact. DistinctStreamSpec bounds the error
    * against the exact twin; DistinctProbe's `approx` mode shows the
    * flat state curve. */
  def approxStream(events: DataFrame, tsCol: String, idCol: String,
                   windowSec: Long, rsd: Double = 0.01): DataFrame =
    events.select(
        window(col(tsCol), s"$windowSec seconds").as("window"),
        col(idCol).cast("string").as("__id"))
      .groupBy(col("window"))
      .agg(approx_count_distinct(col("__id"), rsd).as("n_distinct_approx"))
      .select((unix_timestamp(col("window.start")) * 1000000L).as("window_start"),
        col("n_distinct_approx"))
}
