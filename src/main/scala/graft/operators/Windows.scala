package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fixed (tumbling) and sliding event-time windows — extensions beyond the
 * reference, which implements session windows only (SURVEY.md §2.2).
 * Native `window()`: the assignment is a generated column, the
 * aggregation partial-aggregates before its one shuffle, and the same
 * expression works in Structured Streaming with a watermark.
 */
object Windows {

  /** Per-key tumbling windows of `size`; exposes `w_start`. */
  def tumbling(df: DataFrame, tsCol: String, keyCol: String, size: String,
               aggs: Seq[Column]): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), size))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", col("window.start"))
      .drop("window")

  /** Per-key sliding windows (`size` every `slide`); an event lands in
    * size/slide windows — the explode happens inside Spark's window
    * generator, pre-shuffle. */
  def sliding(df: DataFrame, tsCol: String, keyCol: String, size: String,
              slide: String, aggs: Seq[Column]): DataFrame =
    df.groupBy(col(keyCol), window(col(tsCol), size, slide))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("w_start", col("window.start"))
      .drop("window")

  /**
   * Two-phase sliding COUNT/SUM: first aggregate per slide-grain tumbling
   * bucket (shuffle carries ONE row per event, already combined
   * map-side), then expand each bucket into the size/slide windows that
   * cover it and re-aggregate the (tiny) pre-aggregated rows.
   *
   * Shuffle volume vs. the direct form: the window generator replicates
   * every EVENT size/slide times before the exchange; here replication
   * happens after reduction, on bucket rows — at 100 TB with size/slide=k
   * that is k× less shuffled data, bounded instead by key×bucket
   * cardinality. Valid for any commutative monoid (count/sum/min/max).
   * Equivalent to [[sliding]] — proven in SkewAndWindowSpec.
   */
  def slidingCountTwoPhase(df: DataFrame, tsCol: String, keyCol: String,
                           sizeSec: Long, slideSec: Long): DataFrame = {
    require(sizeSec % slideSec == 0, "size must be a multiple of slide")
    val k = (sizeSec / slideSec).toInt
    val bucket = (unix_timestamp(col(tsCol)) / slideSec).cast("long") // floor
    val pre = df.groupBy(col(keyCol), bucket.as("__b"))
      .agg(count(lit(1)).as("__n"))
    // bucket b contributes to windows starting at (b-i)*slide, i in [0,k)
    pre.select(col(keyCol), col("__n"),
        explode(sequence(col("__b") - (k - 1), col("__b"))).as("__w"))
      .groupBy(col(keyCol), col("__w"))
      .agg(sum(col("__n")).as("n"))
      .withColumn("w_start", timestamp_seconds(col("__w") * slideSec))
      .drop("__w")
  }
}
