package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retrieval-style relevance scoring over the corpus (north-star
 * extension per SURVEY.md §2.2 — the reference has no text surface,
 * /root/reference/src/lib.rs:1-957): Okapi BM25 of every document
 * against a query term set — the primitive behind "which training
 * documents look like this eval query" (decontamination triage), ad-hoc
 * corpus search, and hard-negative mining.
 */
object Retrieval {

  /**
   * BM25 (Robertson et al., TREC-3; the Lucene `ln(1 + …)` idf form so
   * scores stay ≥ 0):
   *
   *   score(d, Q) = Σ_{t ∈ Q, tf > 0}
   *     ln(1 + (N − df + 0.5)/(df + 0.5)) ·
   *     tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
   *
   * Only documents containing ≥ 1 query term appear (BM25 of a
   * no-hit document is 0 — emitting the zeros would mean a full
   * left join against the corpus for rows nobody ranks).
   *
   * Plan shape (the inverted-index computation relationalized): ONE
   * token explode feeds both the doc-length agg and the query-term tf
   * agg (terms filtered by a broadcast isin BEFORE the shuffle, so the
   * tf agg carries only query-term rows — |Q| is query-sized, the
   * corpus never materializes per-term rows for non-query terms); df
   * derives from tf by a term-count agg (|Q| rows); N/Σdl broadcast as
   * a 1-row scalar. Cross-engine determinism follows the l34
   * discipline: each per-(doc, term) score rounds ONCE to 9 dp into
   * DECIMAL(20,9), the per-doc sum is exact decimal arithmetic
   * (shuffle-order-invariant), and the final score rounds to 6 dp.
   *
   * Output: idCol, `n_hits` (distinct query terms present), `score`.
   */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("t"))
      .filter(col("t") =!= "")
    val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("__dl"))
    val scal = dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__toks"))
    val tf = tok.filter(col("t").isin(queryTerms: _*))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("t").agg(count(lit(1)).as("__df"))
    val avgdl = col("__toks").cast("double") / col("__n")
    val idf = log(lit(1) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val term = idf * (col("__tf") * lit(k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * (col("__dl") / avgdl)))
    tf.join(dfT.hint("shuffle_hash"), Seq("t"))
      .join(dl.hint("shuffle_hash"), Seq(idCol))
      .crossJoin(broadcast(scal))
      .select(col(idCol), round(term, 9).cast("decimal(20,9)").as("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        round(sum(col("__s")).cast("double"), 6).as("score"))
  }
}
