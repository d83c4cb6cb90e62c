package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Corpus-level composition analytics for training-data curation
 * (north-star extension per SURVEY.md §2.2 — the reference has no
 * relational surface at all, /root/reference/src/lib.rs:1-957): the
 * questions a data team asks BEFORE mixing/dedup decisions — "is the
 * corpus still contributing new content?" and "which sources say the
 * same things?".
 *
 * Scale shape of both operators: the only shuffles are hash
 * aggregations on the n-gram key (map-side combined) plus joins whose
 * build sides are bounded by #docs or #sources² — nothing all-pairs,
 * nothing driver-side.
 */
object CorpusStats {

  /**
   * Corpus-diversity growth curve: for each document (in `idCol` order,
   * i.e. ingestion order for the synthetic corpus), the number of
   * distinct word n-grams whose FIRST occurrence is that document, plus
   * the running total — the saturation curve data teams read to decide
   * when a source stops contributing novelty (deduplication's
   * macro-level cousin; cf. the scaling-laws practice of tracking
   * unique-token growth).
   *
   * Plan: one explode of the codegen'd [[graft.functions.ShinglesExpr]]
   * → one (gram → min id) hash agg (map-side combined, gram-partitioned
   * — THE scale-bearing shuffle, same shape as l4's band agg) → one
   * tiny (first-doc → count) agg → left join back onto the doc spine.
   * The cumulative sum uses [[Windows.runningSumScalable]] (bucketed
   * two-pass prefix sum), NOT a single-partition window — the curve
   * stays distributed at any corpus size.
   *
   * Output: idCol, `n_novel` (distinct n-grams first seen here),
   * `cum_novel` (running distinct-n-gram count of the corpus prefix).
   */
  def ngramNovelty(docs: DataFrame, textCol: String, idCol: String,
                   n: Int, bucketWidth: Long = 64L): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(wordShingles(col(textCol), n)).as("__g"))
    val first = grams.groupBy(col("__g")).agg(min(col(idCol)).as("__fd"))
    val novel = first.groupBy(col("__fd").as(idCol))
      .agg(count(lit(1)).as("__nn"))
    val spine = docs.select(col(idCol))
      .join(novel, Seq(idCol), "left")
      .withColumn("n_novel", coalesce(col("__nn"), lit(0L)))
      // constant-valued (but non-foldable: id % 1, so Catalyst keeps the
      // equality) group key: runningSumScalable's bucket-offset self-join
      // keeps an equi-component (hash join + inequality filter over the
      // tiny per-bucket summaries) instead of degrading to a
      // nested-loop join when the grouping is genuinely global
      .withColumn("__grp", pmod(col(idCol), lit(1L)).cast("int"))
      .select(col(idCol), col("n_novel"), col("__grp"))
    Windows.runningSumScalable(spine, Seq("__grp"),
      floor(col(idCol) / bucketWidth).cast("long"),
      Seq(col(idCol)), col("n_novel"), "cum_novel")
      .drop("__grp")
  }

  /**
   * Per-source distribution drift: KL(P_source ‖ P_corpus) over unigram
   * token distributions — the corpus-composition number behind "which
   * source is least like the rest?" (domain skew triage, the
   * source-level cousin of l34's Moore-Lewis document scoring).
   *
   * KL(P_s ‖ P_c) = Σ_t (n_st/N_s)·ln((n_st·N)/(N_s·n_t)) with
   * n_st = count of token t in source s, N_s = Σ_t n_st,
   * n_t = corpus count, N = corpus total.
   *
   * Determinism discipline = l33's: the ln argument is computed with
   * every operand cast to DOUBLE FIRST (so no integer-overflow cliff
   * exists at any corpus size and the IEEE expression tree is identical
   * in both engines), the ln is rounded to 9dp and carried as
   * DECIMAL(20,9), the per-source sum is exact decimal (shuffle-order-
   * independent), and the final divide-and-round happens once.
   *
   * Plan: one (source, token) hash agg — THE scale shuffle, map-side
   * combined; corpus token counts derive from that (smaller) table, not
   * a second pass over the corpus; per-source totals and the corpus
   * scalar broadcast back. Token-count join is shuffle-hash (vocab
   * never broadcasts at scale).
   *
   * Output: `src`, `n_tokens` (N_s), `kl_vs_corpus` (6dp).
   */
  def sourceDivergence(docs: DataFrame, textCol: String,
                       srcCol: String): DataFrame = {
    val tok = docs.select(col(srcCol).as("src"),
      explode(wsTokens(col(textCol))).as("__t"))
    val st = tok.groupBy("src", "__t").agg(count(lit(1)).as("__nst"))
    val ct = st.groupBy("__t").agg(sum(col("__nst")).as("__nt"))
    val ns = st.groupBy("src").agg(sum(col("__nst")).as("__ns"))
    val n = ct.agg(sum(col("__nt")).as("__n"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    st.join(ct.hint("shuffle_hash"), Seq("__t"))
      .join(broadcast(ns), Seq("src"))
      .crossJoin(broadcast(n))
      .select(col("src"), col("__nst"), col("__ns"),
        round(log((dbl(col("__nst")) * dbl(col("__n"))) /
          (dbl(col("__ns")) * dbl(col("__nt")))), 9)
          .cast("decimal(20,9)").as("__r"))
      .groupBy("src")
      .agg(max(col("__ns")).as("n_tokens"),
        round(sum(col("__nst").cast("decimal(20,0)") * col("__r"))
          .cast("double") / max(col("__ns")), 6).as("kl_vs_corpus"))
  }

  /**
   * Per-shard mergeable distinct-count sketches (Apache DataSketches
   * HLL via Spark's `hll_sketch_agg`): one binary sketch per shard that
   * can be PERSISTED and unioned later — the cross-job pattern exact
   * counting can't do (sketch each day's ingest once; answer "distinct
   * docs this quarter?" by unioning 90 rows of bytes, never rescanning
   * 100 TB). The map-side-combined shard agg is the only shuffle; each
   * sketch is ≤ ~2^lgK registers regardless of row count.
   */
  def hllShardSketches(df: DataFrame, valueCol: String, shardCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(shardCol).as("shard"))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))

  /** Union previously materialized shard sketches into one distinct
    * estimate — bytes in, one row out; no touch of the base data. */
  def hllMergeEstimate(sketches: DataFrame,
                       sketchCol: String = "sketch"): DataFrame =
    sketches.agg(
      expr(s"hll_sketch_estimate(hll_union_agg($sketchCol))")
        .as("n_distinct"))

  /**
   * Pairwise source-vocabulary overlap: for every pair of sources, how
   * many distinct word n-grams they share — the corpus-composition
   * matrix behind source-level dedup priorities and contamination
   * triage (exact-text overlap is often empty across crawls even when
   * the CONTENT overlaps heavily; n-gram overlap is the honest signal).
   *
   * Plan: distinct (source, gram) — one hash agg — then a self-join on
   * the gram key (gram-partitioned shuffle join; the reused exchange
   * carries both sides) and a final aggregation whose output is bounded
   * by #sources², plus a broadcast of the #sources-row per-source
   * totals for the union denominator. Integer output only — no
   * cross-engine float boundary.
   *
   * Output: `src_a` < `src_b`, `n_shared` (grams in both), `n_union`
   * (grams in either) — Jaccard is n_shared/n_union, left to the
   * caller so the declared result stays exact.
   */
  def sourceOverlap(docs: DataFrame, textCol: String, srcCol: String,
                    n: Int): DataFrame = {
    val grams = docs
      .select(col(srcCol).as("__src"),
        explode(wordShingles(col(textCol), n)).as("__g"))
      .groupBy(col("__src"), col("__g")).agg(count(lit(1)).as("__c"))
      .select(col("__src"), col("__g"))
    val totals = grams.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val shared = grams.as("a")
      .join(grams.as("b"),
        col("a.__g") === col("b.__g") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("src_a"), col("b.__src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(totals).withColumnRenamed("__src", "src_a")
        .withColumnRenamed("__n", "__na"), Seq("src_a"))
      .join(broadcast(totals).withColumnRenamed("__src", "src_b")
        .withColumnRenamed("__n", "__nb"), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        (col("__na") + col("__nb") - col("n_shared")).as("n_union"))
  }

  /**
   * Corpus snapshot diff — the dataset-versioning primitive behind
   * "what changed between crawl N and crawl N+1": per id, `added`
   * (new only), `removed` (old only), `changed` (both, different
   * content hash), or `unchanged`. One full-outer hash join on the id —
   * content compares by md5, so the (huge) text columns never cross the
   * shuffle; the join key coalesces, so every output row has the id.
   * Downstream: `added ∪ changed` is the incremental slice the dedup /
   * scoring pipeline reprocesses; `removed` drives tombstones.
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    // Presence is inferred from hash nullability, so the hash must
    // never be NULL for a present row: md5(NULL) is NULL, which would
    // misfile a NULL-text row as added/removed (or let NULL-vs-text
    // fall through =!= to "unchanged"). Hash a null-normalized value —
    // \u0000 cannot appear in a parquet string that itself hashes
    // equal, so NULL text compares equal only to NULL text.
    def h(c: Column) = md5(coalesce(c, lit("\u0000")))
    oldSnap.select(col(idCol), h(col(textCol)).as("__oh"))
      .join(newSnap.select(col(idCol), h(col(textCol)).as("__nh"))
          .hint("shuffle_hash"), // full-outer hash join: no sort at scale
        Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__oh").isNull, "added")
          .when(col("__nh").isNull, "removed")
          .when(col("__oh") =!= col("__nh"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
