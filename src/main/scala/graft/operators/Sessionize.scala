package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Session-window aggregation — the reference engine's one window type
 * (EventTimeSessionWindow*, /root/reference/src/lib.rs:439-740), mapped
 * onto Spark's native `session_window` (SURVEY.md §2.1 #24-#38, §7.5).
 *
 * Semantics parity (SURVEY.md §2.3): an event joins a session while its
 * ts is strictly inside [start, last_event + gap); bridging events merge
 * neighbouring sessions; a session's aggregate carries the max timestamp
 * (reference `event_reducer`, src/lib.rs:639-654). Spark's
 * MergingSessionsExec implements identical merge rules, with partial
 * aggregation before the shuffle — the scalable version of the
 * reference's single-task BTreeMap store.
 */
object Sessionize {

  /** Group `df` into per-key sessions with the given gap and apply
    * aggregates. Exposes session bounds derived from the data
    * (min/max event ts) rather than the synthetic `window.end = last+gap`
    * so results are engine-portable (SURVEY.md §7.5.2). */
  def sessions(df: DataFrame, tsCol: String, keyCol: String, gap: String,
               aggs: Seq[Column]): DataFrame = {
    val base = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end_last"))
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(base.head, (base.tail ++ aggs): _*)
      .drop("session_window")
  }
}
