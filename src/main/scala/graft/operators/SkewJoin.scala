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
}
