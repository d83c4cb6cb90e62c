package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/**
 * Sentence-boundary token-budget chunking with overlap — the
 * retrieval/embedding front-end (RAG indexing, long-doc eval, context
 * windows for embedding models): cut each document into chunks of at
 * most ~`maxTokens` whitespace tokens, never splitting a sentence, with
 * the tail sentences of each chunk repeated at the head of the next
 * (`overlapTokens`) so no fact straddles a hard boundary unseen.
 * North-star extension: the reference (/root/reference/src/lib.rs:1-957)
 * has no text surface.
 *
 * Deterministic assignment rule (both engines can replay it exactly):
 * sentence s has token interval [start, end) under the per-document
 * running sum; its HOME chunk is `start div maxTokens`, and it is ALSO
 * emitted to chunk c+1 when it ends within `overlapTokens` of that
 * chunk's budget boundary (`end > (c+1)·maxTokens − overlapTokens`)
 * and chunk c+1 exists AS A HOME chunk (some sentence's home IS c+1 —
 * not merely some sentence starting past the boundary: a sentence
 * longer than maxTokens makes home ids jump, and re-emitting into a
 * skipped id would mint a chunk whose only content is the duplicated
 * overlap sentence). Budget is soft at the boundary (a sentence
 * crossing it stays whole in its home chunk — sentences never split),
 * which is the standard sentence-aligned layout.
 *
 * 100 TB shape: sentence explode is token-linear; the running sum is a
 * window PARTITIONED BY the document id (documents are the natural
 * parallel unit — no partition-less window ever sees row-scale data;
 * a single pathological book-length doc is one task, not a skew
 * cliff); the overlap emit is a ≤2× array explode; the final per-chunk
 * agg rides the same doc-keyed shuffle. No joins.
 */
object Chunking {

  /**
   * One row per (doc, chunk): `chunk_id`, `n_sentences`, `n_tokens`
   * (overlap counted — the chunk's real size), and `chunk_text`
   * (sentences in document order, space-joined).
   *
   * Sentences split on whitespace after terminal punctuation
   * (`(?<=[.!?]) ` — Java lookbehind; the oracle states the same cut
   * as a backref replacement, RE2 has no lookbehind).
   */
  def sentenceChunks(docs: DataFrame, textCol: String, idCol: String,
                     maxTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlapTokens >= 0 && overlapTokens < maxTokens,
      s"need 0 <= overlapTokens < maxTokens, got $overlapTokens / $maxTokens")
    val byDoc = Window.partitionBy(col(idCol))
    val order = byDoc.orderBy(col("__ck_pos"))
    val sents = docs
      .select(col(idCol),
        posexplode(split(col(textCol), "(?<=[.!?]) ")).as(Seq("__ck_pos", "__ck_sent")))
      .withColumn("__ck_nt", wsTokenCount(col("__ck_sent")))
      .withColumn("__ck_start",
        coalesce(sum(col("__ck_nt"))
          .over(order.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__ck_home", expr(s"__ck_start div ${maxTokens}L"))
      // chunk c+1 exists iff some sentence's HOME is exactly c+1 —
      // the doc's home set, same window partition (small: ≤ one id
      // per maxTokens tokens of the doc)
      .withColumn("__ck_homes", collect_set(col("__ck_home")).over(byDoc))
    val emitted = sents
      .withColumn("chunk_id",
        explode(when(
          lit(overlapTokens > 0) &&
            col("__ck_start") + col("__ck_nt") >
              (col("__ck_home") + 1) * maxTokens - overlapTokens &&
            array_contains(col("__ck_homes"), col("__ck_home") + 1),
          array(col("__ck_home"), col("__ck_home") + 1))
          .otherwise(array(col("__ck_home")))))
    emitted
      .groupBy(col(idCol), col("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("__ck_nt")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("__ck_pos").as("p"),
            col("__ck_sent").as("s")))),
          e => e("s")), " ").as("chunk_text"))
  }
}
