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
    * word n-gram shingles. One explode + one grouped agg (partial agg
    * combines map-side). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        k: Int = 8, shingleN: Int = 3): DataFrame = {
    val sh = docs
      .select(col(idCol), explode(wordShingles(col(textCol), shingleN)).as("s"))
    val sigs = (0 until k).map(j => min(md5(concat(lit(s"$j|"), col("s")))).as(s"sig$j"))
    sh.groupBy(col(idCol)).agg(sigs.head, sigs.tail: _*)
  }

  /** LSH band table: (id, band_idx, band_hash), bands of r=k/bands sigs. */
  def lshBands(sigs: DataFrame, idCol: String, k: Int = 8, bands: Int = 4): DataFrame = {
    val r = k / bands
    val bandRows = (0 until bands).map { b =>
      val in = (0 until r).map(i => col(s"sig${b * r + i}"))
      sigs.select(col(idCol), lit(b).as("band_idx"), md5(concat(in: _*)).as("band_hash"))
    }
    bandRows.reduce(_ unionAll _)
  }

  /** Candidate near-duplicate pairs (a < b) sharing at least one LSH band. */
  def minhashCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
                            k: Int = 8, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val bandsDf = lshBands(minhashSignatures(docs, textCol, idCol, k, shingleN), idCol, k, bands)
    val a = bandsDf.select(col("band_idx"), col("band_hash"), col(idCol).as("a_id"))
    val b = bandsDf.select(col("band_idx"), col("band_hash"), col(idCol).as("b_id"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Exact n-gram Jaccard over candidate pairs: verify stage of the
    * MinHash pipeline. Joins candidates back to shingle sets; the
    * intersection is an equi-join on the shingle value. */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val pairs = minhashCandidatePairs(docs, textCol, idCol, k, bands, shingleN)
    val sh = docs.select(col(idCol).as("id"), explode(wordShingles(col(textCol), shingleN)).as("s"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.withColumnRenamed("id", "a_id").withColumnRenamed("s", "sa"), Seq("a_id"))
      .join(sh.withColumnRenamed("id", "b_id").withColumnRenamed("s", "sb"), Seq("b_id"))
      .filter(col("sa") === col("sb"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("n", "na"), Seq("a_id"))
      .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("n", "nb"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens: bit b of md5(token) is the
    * high bit of hex digit b (set iff digit ∈ 89abcdef); bits vote ±1 and
    * the per-doc majority forms the signature. Single groupBy with 32
    * partial-aggregating sums. */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(wsTokens(col(textCol))).as("t"))
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

  /** Embedding near-duplicate pairs with cosine > threshold, blocked by
    * `blockCol` to bound the pair space. */
  def embeddingNearDups(embs: DataFrame, vecCol: String, idCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    val a = embs.select(col(blockCol).as("blk"), col(idCol).as("a_id"), col(vecCol).as("va"))
    val b = embs.select(col(blockCol).as("blk"), col(idCol).as("b_id"), col(vecCol).as("vb"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosineSim(col("va"), col("vb")))
      .filter(col("sim") > threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }
}
