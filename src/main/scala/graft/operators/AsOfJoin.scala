package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of join: for each left row, the single most recent right row with
 * `right.ts <= left.ts` within the same key (ties on ts broken by the
 * largest right id).
 *
 * Spark has no native ASOF JOIN; the naive formulation
 * (equi-join + range filter + argmax) explodes to the full per-key cross
 * product before pruning. This implementation is the scalable pattern:
 * UNION both sides, hash-partition once by key, sort within partitions by
 * (ts, side, id), and carry the last-seen right id forward with
 * `last(..., ignoreNulls)` over an unbounded-preceding running window.
 * One shuffle, no join blow-up, linear in |L|+|R| per key — the plan
 * survives a 100× scale-up where the join formulation does not.
 */
object AsOfJoin {

  /**
   * @param left  rows to enrich; columns (keyCol, tsCol, idCol)
   * @param right rows looked up as-of; columns (keyCol, tsCol, idCol)
   * @return one row per left row that has a match:
   *         (keyCol, left_id, left_ts, right_id)
   */
  def lastValueAsOf(left: DataFrame, right: DataFrame,
                    keyCol: String, tsCol: String, idCol: String): DataFrame = {
    val l = left.select(col(keyCol), col(tsCol), col(idCol))
      .withColumn("__side", lit(1)).withColumn("__rid", lit(null).cast("long"))
    val r = right.select(col(keyCol), col(tsCol), col(idCol))
      .withColumn("__side", lit(0)).withColumn("__rid", col(idCol).cast("long"))
    // Right rows sort before left rows at equal ts (side 0 < 1), so an
    // equal-timestamp right row IS visible to the left row (<= semantics);
    // among equal-ts right rows the largest id is last, hence carried.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__asof").isNotNull)
      .select(col(keyCol), col(idCol).as("left_id"), col(tsCol).as("left_ts"),
        col("__asof").as("right_id"))
  }
}
