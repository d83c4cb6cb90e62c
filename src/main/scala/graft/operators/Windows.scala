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
}
