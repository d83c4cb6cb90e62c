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

  /**
   * Temperature-based source rebalancing (the standard multilingual /
   * multi-source mixing stage, temperature α = 0.5): per-stratum
   * sampling rate ∝ n^(α−1), so small sources are up-weighted relative
   * to their share and large ones down-weighted, scaled to keep
   * `targetNum/targetDen` of the corpus overall. Rates are DERIVED FROM
   * THE DATA (one tiny per-key count aggregate, broadcast back), unlike
   * [[rateStratifiedSample]]'s caller-supplied map.
   *
   * Determinism across engines (the l47 oracle): weights are
   * `round(sqrt(n)·1000)` — sqrt is correctly rounded per IEEE-754, so
   * both engines get the identical integer — and the per-key keep
   * threshold is exact integer arithmetic
   * (`65536·targetNum·N·w DIV (targetDen·n·Σw)`) carried in
   * DECIMAL(38,0) (the DuckDB oracle mirrors it in HUGEINT — both are
   * 128-bit-class exact integers, so floor division agrees bit-for-bit);
   * rows keep when the first 4 hex digits of md5(id) sort below the
   * threshold, exactly [[rateStratifiedSample]]'s hash semantics
   * (thresholds ≥ 0x10000 keep the whole stratum). The numerator's worst
   * case — N at the BIGINT count ceiling 9.2·10¹⁸, w ≈ 3·10¹² — is ~37
   * digits, inside DECIMAL(38,0): there is no overflow cliff below the
   * point where `count(*)` itself can no longer be represented. (The
   * earlier BIGINT form wrapped silently past ~10¹⁰ rows; the DECIMAL
   * cast is free — it runs on the #strata-row threshold table, never
   * per-row.)
   *
   * Plan shape: one partial-agg count shuffle over the keys, a
   * broadcast join of the per-key thresholds, and a per-row hash filter
   * — no per-row state, nothing quadratic. Rows with a NULL key are
   * dropped (the inner equi-join never matches null): assign a sentinel
   * stratum upstream if unlabeled rows should participate.
   */
  /**
   * Leakage-safe train/holdout split: assign by the md5 of a GROUP key
   * (dedup-cluster representative, registrable domain, …), so every
   * row of a group lands on the same side — the guard against the
   * classic evaluation leak where near-duplicate documents straddle
   * the split and the holdout scores memorization. A plain per-row
   * `rand() < 0.9` split puts ~10% of every near-dup cluster in the
   * holdout BY CONSTRUCTION; splitting on the group hash makes that
   * impossible, and the md5 keeps the assignment bit-reproducible
   * across runs and engines (the [[stratifiedSample]] discipline).
   * `nTrain`/`nBuckets` set the ratio (default 9/10). Pure per-row
   * projection over an already-grouped column; composing with
   * [[Dedup.duplicateClusters]] is the caller's one extra join (l81).
   */
  def leakageSafeSplit(df: DataFrame, groupCol: String,
                       nTrain: Int = 9, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 0 && nTrain >= 0 && nTrain <= nBuckets)
    df.withColumn("split",
      when((conv(substring(md5(col(groupCol).cast("string")), 1, 4), 16, 10)
        .cast("long") % nBuckets) < nTrain, "train").otherwise("holdout"))
  }

  def temperatureMix(df: DataFrame, keyCol: String, idCol: String,
                     targetNum: Long = 3, targetDen: Long = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val thr = temperatureThresholds(counts, keyCol, targetNum, targetDen)
    df.join(broadcast(thr), Seq(keyCol))
      .filter(col("__thr") >= 65536L ||
        substring(md5(col(idCol).cast("string")), 1, 4) < format_string("%04x", col("__thr")))
      .drop("__thr")
  }

  /** [[temperatureMix]]'s per-stratum threshold table, split out so the
    * arithmetic is testable with synthetic counts far beyond any corpus a
    * test can materialize. `counts` is (keyCol, __n BIGINT); the output is
    * (keyCol, __thr BIGINT), __thr ∈ [0, 65536].
    *
    * The product `65536·targetNum·Σn·w` is computed in DECIMAL(38,0) —
    * BIGINT wraps silently (ANSI off) once it passes 2⁶³ at roughly 10¹⁰
    * corpus rows, silently corrupting every threshold, while the DuckDB
    * oracle's BIGINT would error instead: the engines would diverge
    * exactly when it matters. Spark's `div` on decimals is integral
    * division returning BIGINT, so downstream stays a plain long column. */
  private[graft] def temperatureThresholds(counts: DataFrame, keyCol: String,
                                           targetNum: Long, targetDen: Long): DataFrame = {
    val w = counts
      .withColumn("__w", round(sqrt(col("__n")) * 1000).cast("long"))
    val tot = w.agg(sum(col("__w")).as("__sw"), sum(col("__n")).as("__nn"))
    w.crossJoin(broadcast(tot))
      .withColumn("__thr",
        least(lit(65536L),
          expr(s"(CAST(65536 AS DECIMAL(38,0)) * ${targetNum}L * __nn * __w)" +
            s" DIV (CAST(${targetDen} AS DECIMAL(38,0)) * __n * __sw)")))
      .select(col(keyCol), col("__thr"))
  }

  /**
   * Token-BUDGET mixture sampling (l90) — the dataloader-facing mixing
   * knob the rate/temperature forms are not: a training recipe
   * specifies a TARGET MIXTURE (per-stratum weights, ppm) and a global
   * TOKEN budget, and each stratum d should contribute ≈ w_d·B tokens.
   * Keep rate r_d = min(1, w_d·B / T_d) over the stratum's token mass
   * T_d — an under-massed stratum keeps everything and the mix
   * under-fills HONESTLY (report and re-weight; never oversample
   * duplicates to hit a quota). Thresholds are exact integers in
   * DECIMAL(38,0) (the [[temperatureMix]] discipline — BIGINT would
   * wrap silently at 10¹⁸-token strata): __thr = 65536·w_ppm·B DIV
   * (10⁶·T_d), capped at 65536; a row keeps iff the first 4 md5 hex
   * digits of its id sort below the threshold (the
   * [[rateStratifiedSample]] hash semantics, so the draw is
   * bit-reproducible across engines and runs). Strata absent from
   * `weightsPpm` weigh 0 and drop. Plan shape: one map-side-combined
   * token-sum agg over the keys, a broadcast threshold join, a pure
   * per-row hash filter — no per-row state, nothing quadratic.
   */
  def tokenBudgetMix(df: DataFrame, keyCol: String, idCol: String,
                     tokenCol: String, weightsPpm: Map[String, Long],
                     budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0 && weightsPpm.values.forall(_ >= 0),
      "budget and weights must be >= 0")
    val wExpr = weightsPpm.foldLeft(lit(0L)) { case (acc, (k, w)) =>
      when(col(keyCol) === k, lit(w)).otherwise(acc)
    }
    val thr = df.groupBy(col(keyCol)).agg(sum(col(tokenCol)).as("__tt"))
      .withColumn("__w", wExpr)
      .withColumn("__thr",
        least(lit(65536L),
          expr(s"(CAST(65536 AS DECIMAL(38,0)) * __w * ${budgetTokens}L)" +
            " DIV (CAST(1000000 AS DECIMAL(38,0)) * __tt)")))
      .select(col(keyCol), col("__thr"))
    df.join(broadcast(thr), Seq(keyCol))
      .filter(col("__thr") >= 65536L ||
        substring(md5(col(idCol).cast("string")), 1, 4) < format_string("%04x", col("__thr")))
      .drop("__thr")
  }

  /**
   * Deterministic weighted sampling WITHOUT replacement — priority
   * sampling (Duffield, Lund & Thorup, "Priority sampling for estimating
   * arbitrary subset sums", JACM 54(6), 2007): row i draws a fixed
   * pseudo-random uniform u_i from md5(id) and gets priority w_i/u_i;
   * the k highest-priority rows per stratum form the sample, so
   * P(selected) ≈ min(1, w_i·τ) for the stratum's threshold τ — longer
   * (or higher-quality, or whatever `weightCol` encodes) documents are
   * proportionally more likely, yet the draw is bit-reproducible across
   * engines and runs (the md5 trick of [[stratifiedSample]], weighted).
   *
   * Integer-exact cross-engine form: u_i = first 15 md5 hex digits + 1
   * (u ∈ [1, 16¹⁵] — fits BIGINT) and rows rank by floor(u_i / w_i)
   * ASCENDING — u/w smallest ⟺ w/u largest, same order with no overflow
   * anywhere (the quotient only shrinks). Equal quotients break by id.
   * The floor costs resolution only as w_i approaches u_i's 1.15·10¹⁸
   * range; weights are lengths/scores, not 10¹⁸-scale numbers.
   *
   * Selection runs through [[Windows.topKPerKeyScalable]] — #strata × 16
   * parallel sub-sorts, never one multi-TB task per stratum. Weights
   * must be ≥ 1: 0 divides to null (sorts first — corrupting), and
   * negative weights are meaningless. Filter or clamp upstream.
   */
  def weightedPrioritySample(df: DataFrame, keyCol: String, idCol: String,
                             weightCol: String, k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long") + 1
    val d = df.withColumn("__u", u)
      .withColumn("__q", expr(s"__u DIV `$weightCol`"))
    Windows.topKPerKeyScalable(d, Seq(keyCol), Seq(col("__q"), col(idCol)),
        k, pmod(xxhash64(col(idCol)), lit(16)), "__rk")
      .select(df.columns.map(col): _*)
  }

  /**
   * EXACT per-stratum percentile gating — the curation step after a
   * quality signal is computed (CCNet keeps the best perplexity
   * tertiles; FineWeb-Edu keeps scores above a percentile): within
   * each `keyCol` stratum, drop the lowest `dropBelowPpm`/1e6 fraction
   * of rows by `scoreCol` (ascending; `idCol` breaks exact score ties,
   * so the kept set is deterministic and cross-engine reproducible —
   * NO approximate-quantile sketch whose cutoffs depend on merge
   * order).
   *
   * The rank is EXACT but never windows a whole stratum in one task:
   * [[Windows.runningSumChunked]] over (score, id-chunk) buckets — the
   * l64 two-pass form — so a stratum of a billion rows ranks as
   * bounded per-bucket sorts plus a bucket-offset prefix sum, even
   * when every row carries the SAME score (the id-chunk component
   * bounds bucket size under total ties). Stratum row-counts join
   * back BROADCAST (strata are languages/sources — small by
   * construction of a stratified gate).
   *
   * Adds `out` (rank, 1-based in (score, id) order) and `kept` =
   * rank > ⌊n·dropBelowPpm/1e6⌋ — exact integer threshold arithmetic.
   */
  def percentileGate(df: DataFrame, keyCol: String, scoreCol: String,
                     idCol: String, dropBelowPpm: Long,
                     out: String = "score_rank", idChunk: Long = 65536L): DataFrame = {
    require(dropBelowPpm >= 0 && dropBelowPpm < 1000000L,
      s"dropBelowPpm must be in [0, 1e6), got $dropBelowPpm")
    val ranked = Windows.runningSumChunked(df, Seq(keyCol),
      struct(col(scoreCol), expr(s"CAST(`$idCol` AS BIGINT) div ${idChunk}L")),
      Seq(col(scoreCol), col(idCol)), lit(1L), out)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__pg_n"))
    ranked
      .join(broadcast(counts), Seq(keyCol))
      .withColumn("kept",
        col(out) > expr(s"(__pg_n * ${dropBelowPpm}L) div 1000000L"))
      .drop("__pg_n")
  }
}
