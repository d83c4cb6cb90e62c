package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.wsTokenCount

/**
 * Training-sequence packing (north-star extension): the GPT-style
 * pretraining layout — concatenate every document's tokens in a
 * deterministic order (ascending id) into one virtual stream and cut
 * it into fixed-`seqLen` training sequences, documents crossing
 * sequence boundaries wherever they fall. This is the step between a
 * curated corpus and a token-budgeted dataloader: l30's shard packing
 * bins whole documents by BYTES for storage; this packs TOKENS into
 * fixed-length training rows, splitting documents, losing nothing.
 *
 * Output: one row per (sequence × document) overlap —
 * `(seq_id, id, tok_from, tok_to)` with doc-LOCAL token offsets
 * (`tok_from` inclusive, `tok_to` exclusive), i.e. sequence `seq_id`
 * contains tokens `[tok_from, tok_to)` of document `id`. Every token
 * lands in exactly one sequence; every sequence except the last sums
 * to exactly `seqLen` tokens (the trailing partial sequence is
 * emitted — callers drop or pad it by policy). A document of n tokens
 * yields at most n/seqLen + 2 rows, so the explode is token-linear.
 *
 * Scale shape: the only global computation is the exclusive prefix
 * sum of token counts in id order, which runs through
 * [[Windows.runningSumChunked]] — per-chunk partial sums + a
 * chunk-level offsets window — so no partition-less window ever sees
 * row-scale data (the t18/l64 discipline; `idChunk` sizes the chunks
 * and only needs to keep chunk count ≪ rows). Everything after the
 * prefix sum is a pure per-row projection + a bounded explode.
 */
object Packing {

  def sequencePack(docs: DataFrame, textCol: String, idCol: String,
                   seqLen: Long, idChunk: Long = 1L << 16): DataFrame = {
    require(seqLen > 0 && idChunk > 0)
    val withN = docs.select(col(idCol), wsTokenCount(col(textCol)).as("__n"))
    val pre = Windows.runningSumChunked(withN, Seq.empty,
      expr(s"CAST($idCol AS BIGINT) div ${idChunk}L"), Seq(col(idCol)),
      col("__n"), "__cum")
    pre.filter(col("__n") > 0)
      .withColumn("__start", col("__cum") - col("__n"))
      .select(col(idCol), col("__n"), col("__start"),
        explode(sequence(
          expr(s"__start div ${seqLen}L"),
          expr(s"(__start + __n - 1) div ${seqLen}L"))).as("seq_id"))
      .select(col("seq_id"), col(idCol),
        greatest(lit(0L), col("seq_id") * seqLen - col("__start")).as("tok_from"),
        least(col("__n"), (col("seq_id") + 1) * seqLen - col("__start")).as("tok_to"))
  }
}
