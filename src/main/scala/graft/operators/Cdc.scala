package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC / MERGE application (north-star extension per SURVEY.md §2.2):
 * apply a change batch — upserts and deletes keyed by `keyCol` — to a
 * base snapshot, producing the next snapshot. The `MERGE INTO`
 * capability lakehouse formats ship, from stock operators; the inverse
 * of [[CorpusStats.snapshotDiff]] (diff tells you WHAT changed between
 * snapshots; this APPLIES a change set to make the next one).
 *
 * Semantics (per key, at most one change row — enforce upstream):
 * op = "D" removes the key; any other op ("U"/"I") replaces/creates
 * the payload; base keys without a change pass through.
 *
 * 100 TB shape: ONE full-outer shuffle-hash join on the key (both
 * sides hash-partition once; no sort — the [[CorpusStats.snapshotDiff]]
 * posture), then a per-row CASE projection. The change batch is
 * usually ≪ base, but full-outer keeps the plan safe when it is not
 * (a broadcast variant would OOM on a backfill-sized change set).
 */
object Cdc {

  /**
   * @param payloadCols payload columns present in BOTH frames; the
   *   result carries (keyCol, payloadCols…) for the merged snapshot.
   */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String, payloadCols: Seq[String]): DataFrame = {
    val b = base.select(col(keyCol) +: payloadCols.map(c => col(c).as(s"__b_$c")): _*)
    val c = changes.select(
      col(keyCol) +: col(opCol).as("__op") +: payloadCols.map(c0 => col(c0).as(s"__c_$c0")): _*)
    b.join(c.hint("shuffle_hash"), Seq(keyCol), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(keyCol) +: payloadCols.map(c0 =>
        when(col("__op").isNotNull, col(s"__c_$c0"))
          .otherwise(col(s"__b_$c0")).as(c0)): _*)
  }
}
