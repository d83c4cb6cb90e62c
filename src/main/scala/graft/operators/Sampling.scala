package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Deterministic sampling for dataset curation (training-data pipelines
 * subsample constantly; `rand()` breaks reproducibility and oracle
 * checks).
 *
 * The trick: order rows within each stratum by `md5(id)` — a fixed
 * pseudo-random permutation — and keep the first n. Fully reproducible
 * across engines and runs, one shuffle (the per-key window), and the
 * hash order is uncorrelated with any data ordering.
 */
object Sampling {

  /** First `n` rows per `keyCol`, in md5(id) order.
    *
    * The rank runs in the t18 two-pass prefix-offset form
    * ([[Windows.runningSumScalable]], bucketed by the hash's leading hex
    * byte — a prefix of the sort key, so monotone within each stratum):
    * a plain per-stratum `row_number` window would cap parallelism at
    * the number of strata (a handful of languages over 100 TB = multi-TB
    * single tasks — the same hazard the l30/l41 rewrites removed).
    * Output is bit-identical to the window form. */
  def stratifiedSample(df: DataFrame, keyCol: String, idCol: String, n: Int): DataFrame =
    Windows.runningSumScalable(
        df.withColumn("__h", md5(col(idCol).cast("string"))),
        Seq(keyCol), substring(col("__h"), 1, 2),
        Seq(col("__h"), col(idCol)), lit(1L), "__rn")
      .filter(col("__rn") <= n)
      .drop("__h", "__rn")

  /** Bernoulli-style deterministic sample: keep a row iff the first 4
    * hex digits of md5(id) fall below `rate` × 16^4 — reproducible
    * row-level sampling without a per-key shuffle (pure map). */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    val threshold = (rate * 65536).toLong
    df.filter(conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long") < threshold)
  }

  /** Per-stratum Bernoulli rates — domain mixing/reweighting (downsample
    * a dominant source, keep the rest): keep a row of stratum s iff its
    * md5-hash fraction falls below `rates(s)` (or `defaultRate`). A pure
    * per-row filter: no shuffle at any scale, reproducible across
    * engines (fixed-width lowercase hex compares lexicographically =
    * numerically, so the oracle is a plain string comparison). */
  def rateStratifiedSample(df: DataFrame, keyCol: String, idCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 1.0): DataFrame = {
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    // Compare against the ROUNDED threshold, not the raw rate: for rates
    // in [~0.9999924, 1.0) round(rate*65536) == 65536, which %04x would
    // format as the 5-char "10000" — lexicographically below every hash
    // starting with a letter, silently dropping ~94% of the stratum. Any
    // threshold at or past the 4-digit ceiling means "keep everything".
    def keep(rate: Double) = {
      val v = math.max(math.round(rate * 65536), 0L)
      if (v >= 65536L) lit(true)
      else h < lit(f"${v.toInt}%04x")
    }
    val cond = rates.foldLeft(keep(defaultRate)) { case (acc, (k, r)) =>
      when(col(keyCol) === k, keep(r)).otherwise(acc)
    }
    df.filter(cond)
  }
}
