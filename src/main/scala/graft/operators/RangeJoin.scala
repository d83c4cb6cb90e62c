package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bounded time-range join: pairs (a, b) with the same key where
 * `a.ts < b.ts <= a.ts + window`.
 *
 * The naive formulation (equi-join on the key, then the time predicate)
 * materializes n² candidate rows for a key with n events before the
 * filter prunes — the classic range-join scale-killer. This form buckets
 * time by the window length: a follow window starting in bucket p can
 * only land in buckets p or p+1, so side a probes both and the join is a
 * plain equi-join on (key, bucket). Candidates are bounded by
 * events-per-window-length, not events-per-key². Each b row lives in
 * exactly one bucket, so no pair is produced twice.
 */
object RangeJoin {

  /** `left` and `right` must both have `keyCol` and `tsCol` (timestamp).
    * Output: left columns prefixed `a_`, right prefixed `b_`, for every
    * pair with `a_ts < b_ts <= a_ts + windowMicros`. */
  def follows(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
              idCol: String, windowMicros: Long): DataFrame = {
    val bkt = (c: Column) => floor(unix_micros(c) / lit(windowMicros)).cast("long")
    val a = left.select(col(keyCol), col(tsCol).as("a_ts"), col(idCol).as("a_id"))
      .withColumn("__bkt", explode(array(bkt(col("a_ts")), bkt(col("a_ts")) + 1)))
    val b = right.select(col(keyCol), col(tsCol).as("b_ts"), col(idCol).as("b_id"),
      bkt(col(tsCol)).as("__bkt"))
    a.join(b, Seq(keyCol, "__bkt"))
      .filter(col("b_ts") > col("a_ts") &&
        unix_micros(col("b_ts")) <= unix_micros(col("a_ts")) + windowMicros)
      .select(col(keyCol), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
  }
}
