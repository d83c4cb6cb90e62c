package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/**
 * Deduplication operators for large text/embedding corpora — the
 * north-star surface absent from the reference engine (SURVEY.md §2.2).
 *
 * Scale design (the point of these at 100 TB):
 *  - exact: one hash-partitioned aggregation, map-side partial agg.
 *  - minhash: signatures are k per-doc `min` aggregates over exploded
 *    shingles (one shuffle by doc_id with partial agg — NOT a k-times
 *    row blow-up), then LSH banding turns the quadratic pair search into
 *    an equi-join on (band_idx, band_hash), which Spark executes as a
 *    hash shuffle join co-partitioned on the band key. Only colliding
 *    buckets produce pairs.
 *  - simhash: 32 conditional-sum aggregates in a single groupBy —
 *    again one shuffle, no bit-dimension explosion.
 *  - embedding near-dup: blocked (label) join so the pair space is
 *    per-block quadratic instead of corpus-quadratic; swap the blocking
 *    key for an LSH bucket at larger scales.
 *
 * Hash-function portability: every hash is md5-hex (identical across
 * engines); min-hash signatures compare lexicographically on the hex
 * string, and simhash bits read the high bit of one hex digit
 * (digit ∈ {8..f}) — all reproducible in ANSI SQL for the oracle.
 */
object Dedup {

  /** Exact-duplicate profile: one row per distinct content hash with the
    * multiplicity and the kept (minimum) doc id. `dropDuplicates`-style
    * filtering is `filter(c === 1)` + join back, or use [[exactKept]]. */
  def exactProfile(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("c"), min(col(idCol)).as("keep"))

  /** Rows surviving exact dedup (min id per content hash wins). */
  def exactKept(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-document MinHash signature columns sig0..sig{k-1} over distinct
    * word n-gram shingles: one explode + one grouped agg. The k `min`s
    * partial-aggregate map-side, so the shuffle carries k hashes per doc,
    * not the shingle rows. (Measured against a shuffle-free
    * higher-order-function formulation — `array_min(transform(...))` —
    * the explode form is ~4× faster at sf0.1: Spark HOF lambdas are
    * CodegenFallback, while explode + hash-agg stays in whole-stage
    * codegen. The shuffle it keeps is the already-combined per-doc
    * signature rows, which is negligible at any scale.) */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        k: Int = 8, shingleN: Int = 3): DataFrame = {
    // Hash-partition the RAW docs by id up front: the shingle/md5 work
    // parallelizes across all cores even when the source is one small
    // file (one input split), and the groupBy below reuses the
    // partitioning — explode is narrow, so no second shuffle. At scale
    // this moves the only shuffle from exploded shingle rows to the far
    // smaller raw-document rows.
    val sh = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(wordShingles(col(textCol), shingleN)).as("s"))
    val sigs = (0 until k).map(j => min(md5(concat(lit(s"$j|"), col("s")))).as(s"sig$j"))
    sh.groupBy(col(idCol)).agg(sigs.head, sigs.tail: _*)
  }

  /** LSH band table: (id, band_idx, band_hash), bands of r=k/bands sigs.
    * One projection + an explode of the (tiny) band array — the signature
    * input is evaluated once, not once per band as a per-band union
    * would. */
  def lshBands(sigs: DataFrame, idCol: String, k: Int = 8, bands: Int = 4): DataFrame = {
    val r = k / bands
    val bandStructs = (0 until bands).map { b =>
      val in = (0 until r).map(i => col(s"sig${b * r + i}"))
      struct(lit(b).as("band_idx"), md5(concat(in: _*)).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("__band"))
      .select(col(idCol), col("__band.band_idx").as("band_idx"),
        col("__band.band_hash").as("band_hash"))
  }

  /** Candidate near-duplicate pairs (a < b) sharing at least one LSH
    * band. The band table (bands× short rows per doc — a tiny fraction of
    * the corpus) is persisted before the self-join: without it each join
    * side recomputes the whole shingle→signature pipeline (AQE broadcasts
    * one side, which defeats shuffle-exchange reuse). */
  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
                            k: Int = 8, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val bandsDf = lshBands(minhashSignatures(docs, textCol, idCol, k, shingleN), idCol, k, bands)
      .persist()
    val a = bandsDf.select(col("band_idx"), col("band_hash"), col(idCol).as("a_id"))
    val b = bandsDf.select(col("band_idx"), col("band_hash"), col(idCol).as("b_id"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact n-gram Jaccard over candidate pairs: verify stage of the
    * MinHash pipeline. The candidate set is tiny relative to the corpus
    * (that is LSH's whole point), so each pair pulls both documents'
    * shingle SETS (array columns — no explode) and intersects them with
    * `array_intersect`: two hash joins keyed on doc id and zero wide
    * shuffles, instead of the |pairs|×|shingles| blow-up an exploded
    * shingle equi-join produces. */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val pairs = minhashCandidatePairs(docs, textCol, idCol, k, bands, shingleN)
    // persisted: referenced by both join sides (one shingle array per doc)
    val sets = docs.select(col(idCol).as("id"), wordShingles(col(textCol), shingleN).as("sh"))
      .persist()
    pairs
      .join(sets.select(col("id").as("a_id"), col("sh").as("__sha")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("sh").as("__shb")), Seq("b_id"))
      .withColumn("__inter", size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .select(col("a_id"), col("b_id"),
        (col("__inter").cast("double") /
          (size(col("__sha")) + size(col("__shb")) - col("__inter"))).as("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens: bit b of md5(token) is the
    * high bit of hex digit b (set iff digit ∈ 89abcdef); bits vote ±1 and
    * the per-doc majority forms the signature. Single groupBy with 32
    * partial-aggregating sums — md5 once per token, all 32 votes combined
    * map-side, whole-stage codegen throughout (an array-fold HOF variant
    * measured 2× slower: HOF lambdas are CodegenFallback). */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // repartition rationale as in minhashSignatures
    val tok = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(wsTokens(col(textCol))).as("t"))
      .withColumn("h", md5(col("t")))
    val votes = (0 until 32).map { b =>
      sum(when(instr(lit("89abcdef"), substring(col("h"), b + 1, 1)) > 0, 1L).otherwise(-1L)).as(s"v$b")
    }
    val agg = tok.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sig: Column = (0 until 32)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), sig.as("simhash"))
  }

  /**
   * End-to-end corpus dedup: drop exact duplicates (min id per content
   * hash wins), then drop near-duplicates — for every MinHash candidate
   * pair whose exact shingle Jaccard ≥ `jaccardThreshold`, the larger id
   * loses. Returns the surviving rows with their original columns.
   *
   * Shape at scale: one exact-hash window pass + the LSH pipeline + one
   * anti join — no quadratic stage anywhere; union-find chains collapse
   * greedily (b dropped whenever paired with any surviving-or-not a<b,
   * the standard keep-first policy for dedup cascades).
   */
  def dedupCorpus(docs: DataFrame, textCol: String, idCol: String,
                  jaccardThreshold: Double = 0.8,
                  k: Int = 8, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val exact = exactKept(docs, textCol, idCol)
    val losers = ngramJaccard(exact, textCol, idCol, k, bands, shingleN)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("b_id").as(idCol)).distinct()
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Embedding near-duplicate pairs with cosine > threshold, blocked by
    * `blockCol` to bound the pair space. L2 norms are computed per row
    * BELOW the pair join (per-pair work = one dot product); arithmetic
    * is unchanged, so results stay bit-identical to the naive form. */
  def embeddingNearDups(embs: DataFrame, vecCol: String, idCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    val a = embs.select(col(blockCol).as("blk"), col(idCol).as("a_id"),
      col(vecCol).as("__va"), l2Norm(col(vecCol)).as("__na"))
    val b = embs.select(col(blockCol).as("blk"), col(idCol).as("b_id"),
      col(vecCol).as("__vb"), l2Norm(col(vecCol)).as("__nb"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("sim") > threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }
}
