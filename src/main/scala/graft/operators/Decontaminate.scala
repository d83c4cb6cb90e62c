package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Benchmark decontamination — the n-gram-collision scrub every serious
 * pretraining run performs before training (GPT-3 appendix C: 13-gram
 * overlap; PaLM, Llama and FineWeb run the same shape): a training
 * document is CONTAMINATED if it shares any word n-gram with an
 * evaluation benchmark, because training on eval text silently inflates
 * every downstream score. North-star extension: the reference
 * (/root/reference/src/lib.rs:1-957) has no text surface.
 *
 * Both sides normalize first ([[graft.functions.TextFunctions.normalizeText]]
 * — case/punctuation/whitespace-insensitive matching, the GPT-3 recipe)
 * and shingle to DISTINCT word n-grams (`wordShingles` is distinct by
 * construction, so a gram repeated inside one doc counts once).
 *
 * 100 TB shape: the benchmark side is SMALL by definition (eval suites
 * are thousands of documents — millions of grams, tens of MB), so its
 * gram table BROADCASTS and the corpus side never shuffles for the
 * match: explode (token-linear) → broadcast hash semi-join → per-doc
 * count agg (map-side combined). The only exchange in the plan is the
 * final per-doc agg / attach join, both keyed by the doc id.
 */
object Decontaminate {

  /** Distinct normalized word n-grams of a benchmark table — build once,
    * reuse against every training shard. */
  def benchGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench
      .select(explode(wordShingles(normalizeText(col(textCol)), n)).as("gram"))
      .distinct()

  /**
   * Per-document contamination counts: `n_hit_grams` = how many of the
   * document's distinct n-grams appear in the benchmark (0 for clean
   * docs — every input doc gets a row), `contaminated` = any hit.
   * `grams` should be [[benchGrams]] output (or any 1-column gram
   * relation); it is broadcast.
   */
  def flagContaminated(docs: DataFrame, textCol: String, idCol: String,
                       grams: DataFrame, n: Int): DataFrame = {
    val gramTable = grams.select(col(grams.columns.head).as("__dc_gram"))
    val hits = docs
      .select(col(idCol),
        explode(wordShingles(normalizeText(col(textCol)), n)).as("__dc_gram"))
      .join(broadcast(gramTable), "__dc_gram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("__dc_hits"))
    docs
      .join(hits.hint("shuffle_hash"), Seq(idCol), "left")
      .withColumn("n_hit_grams", coalesce(col("__dc_hits"), lit(0L)))
      .withColumn("contaminated", col("n_hit_grams") > 0L)
      .drop("__dc_hits")
  }
}
