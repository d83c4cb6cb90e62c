package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys — the manual escape hatch when AQE's
 * skew-join split (which only rebalances post-shuffle partitions of
 * sort-merge joins) is not enough, e.g. one key holding 10% of a 100 TB
 * fact table.
 *
 * Mechanics: the large (skewed) side gets a deterministic salt in
 * [0, buckets) derived from hashing its whole row (`xxhash64`), widening
 * one hot key into `buckets` shuffle partitions; the small side is
 * replicated `buckets` times with every salt value. The join key becomes
 * (key, salt). Row multiplicity is unchanged — each left row matches
 * exactly the right rows it matched before, found in its salt bucket.
 *
 * Choose `buckets` ≈ the skew factor (hot-key share ÷ average-key
 * share); the small side's replication cost is |right| × buckets rows
 * through one shuffle.
 */
object SkewJoin {

  /** Inner equi-join of `large ⋈ small` on `key`, salted `buckets` ways.
    * Column sets must be disjoint apart from `key`. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      buckets: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Pre-flight key-distribution diagnostics for a planned join or
   * aggregation: the `topK` heaviest keys with exact counts, each key's
   * parts-per-million share of the table, and its skew ratio ×1000
   * against the mean key (count · #keys / total) — the numbers that
   * decide broadcast vs [[saltedInnerJoin]] (size `buckets` ≈
   * skew_x1000 / 1000) vs trusting AQE, BEFORE burning a 100 TB shuffle
   * to find out.
   *
   * Plan shape: one partial-aggregated count shuffle over the keys, a
   * 1-row scalar broadcast of (total, #keys), then TakeOrderedAndProject
   * for the top-k — no global sort, k rows to the driver. Products are
   * computed in DECIMAL(38,0) (a count near the BIGINT ceiling times
   * #keys overflows int64 silently with ANSI off); `DIV` brings the
   * bounded quotients back to BIGINT. Integer outputs keep the numbers
   * engine-exact.
   */
  def keyStats(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("key_count"))
    val tot = counts.agg(sum(col("key_count")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        expr("CAST(key_count AS DECIMAL(38,0)) * 1000000 DIV __total"))
      .withColumn("skew_x1000",
        expr("CAST(key_count AS DECIMAL(38,0)) * __nkeys * 1000 DIV __total"))
      .select(col(keyCol), col("key_count"), col("share_ppm"), col("skew_x1000"))
      .orderBy(col("key_count").desc, col(keyCol))
      .limit(topK)
  }
}
