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
                   seqLen: Long, idChunk: Long = 1L << 16): DataFrame =
    packLayout(docs.select(col(idCol), wsTokenCount(col(textCol)).as("__n")),
      idCol, seqLen, idChunk)

  /** The concat-and-cut layout over a precomputed (idCol, __n
    * token-count) frame — [[sequencePack]]'s tail, shared with the
    * BPE-budgeted front-end [[sequencePackBpe]]. */
  private def packLayout(withN: DataFrame, idCol: String,
                         seqLen: Long, idChunk: Long): DataFrame = {
    require(seqLen > 0 && idChunk > 0)
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

  /**
   * BPE-token-budgeted packing (l89): [[sequencePack]]'s layout with
   * the budget counted in REAL tokenizer tokens instead of whitespace
   * words — a production dataloader's sequence budget is BPE tokens,
   * and whitespace counts misprice long words (many BPE tokens) and
   * CJK-ish scripts (one "word" = many tokens). Per-document counts
   * come from [[Bpe.encodeWordsFast]]'s encoding of the DISTINCT-word
   * vocabulary (broadcast rank map, one narrow pass over |vocab|)
   * joined back to per-(doc, word) multiplicities — the corpus-scale
   * work is two map-side-combined aggs and one shuffle-hash join on
   * the word; token offsets then flow through the same chunked prefix
   * sum as l80. With EMPTY merges a word encodes to its code points,
   * so the budget degenerates to the non-space character count — the
   * oracle-expressible form the declared query certifies; trained
   * merge tables are golden-pinned in the spec (PackingBpeSpec cases),
   * including full-merge tables under which the layout is IDENTICAL
   * to [[sequencePack]]'s.
   * Output: (seq_id, idCol, tok_from, tok_to) — BPE-token offsets,
   * same contract as [[sequencePack]].
   */
  def sequencePackBpe(docs: DataFrame, textCol: String, idCol: String,
                      merges: Seq[(String, String)], seqLen: Long,
                      idChunk: Long = 1L << 16): DataFrame = {
    // occurrence side split on WHITESPACE RUNS — the exact split
    // Bpe.wordCounts (the vocab side of the join below) uses: a
    // literal-space split would fuse newline-joined words into tokens
    // ABSENT from the vocab, and the inner join would silently drop
    // them from the budget on multi-line documents
    val dw = docs.select(col(idCol),
        explode(split(col(textCol), "[ \n\t\r]+")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__m"))
    val wl = Bpe.encodeWordsFast(docs, textCol, merges)
      .select(col("w").as("__w"), size(col("syms")).cast("long").as("__len"))
    val withN = dw.join(wl.hint("shuffle_hash"), Seq("__w"))
      .groupBy(col(idCol))
      .agg(sum(col("__m") * col("__len")).as("__n"))
    packLayout(withN, idCol, seqLen, idChunk)
  }

  /**
   * BYTE-level-BPE-budgeted packing (l123): the same layout with the
   * budget counted in the GPT-lineage tokenizer's own tokens
   * ([[ByteBpe.tokenCounts]] — pre-tokenizer explode + distinct-token
   * broadcast-rank encode + shuffle-hash join-back), which is what
   * production dataloader budgets actually price in. Whitespace is
   * DATA here (a space costs a byte unit or merges into 'Ġword'
   * pieces), unlike [[sequencePackBpe]]'s word-level budget. With the
   * EMPTY merge table every token prices at its UTF-8 byte count and —
   * because the pre-tokenizer provably tiles text — the budget
   * degenerates to `octet_length(text)`, the oracle-expressible form
   * the declared query certifies; trained tables are golden-pinned by
   * l114. Zero-token documents emit no rows (the packLayout contract
   * shared by every front-end).
   */
  def sequencePackByteBpe(docs: DataFrame, textCol: String, idCol: String,
                          merges: Seq[(String, String)], seqLen: Long,
                          idChunk: Long = 1L << 16): DataFrame =
    packLayout(
      ByteBpe.tokenCounts(docs, idCol, textCol, merges)
        .select(col(idCol), col("n_tokens").as("__n")),
      idCol, seqLen, idChunk)

  /**
   * Split-AVERSE whole-document packing (l86) — the Llama-class layout
   * that keeps attention within documents: every document ≤ `seqLen`
   * tokens is placed WHOLE into exactly one `seqLen`-token bin (never
   * split, unlike [[sequencePack]]'s boundary cuts); documents longer
   * than `seqLen` are TRUNCATED to `seqLen` (the explicit overflow
   * policy) and fill a bin alone.
   *
   * Sequential best-fit-decreasing does not distribute, so this is the
   * deterministic distributed greedy in its place — LENGTH-CLASS SHELF
   * packing (the l30 prefix-offset pattern per length class): a
   * document of nt tokens belongs to class c = seqLen div nt, and any
   * c documents of that class fit one bin (each has nt ≤ seqLen/c).
   * Documents are ranked within their class by id, binned c at a time,
   * and class bin-ranges are laid out contiguously by ascending c —
   * largest documents' bins first, the "decreasing" order across
   * classes. Intra-class order cannot affect feasibility or the waste
   * bound (all members share the capacity c), which is what lets the
   * rank run through [[Windows.runningSumChunked]] — per-(class, id
   * chunk) windows, so a skewed length distribution (a billion
   * same-length docs = one class) never becomes one window task.
   * GUARANTEE: every full bin of class c holds > c·seqLen/(c+1) ≥
   * seqLen/2 tokens (class members exceed seqLen/(c+1)), the classic
   * harmonic-shelf utilization floor; only the last bin of each class
   * can be emptier.
   *
   * Output: one row per document — (bin_id, idCol, n_tok, tok_kept,
   * truncated), integer-exact and order-free (the oracle recomputes
   * the same greedy relationally). Shuffles: the rank's chunked
   * windows + one broadcast join of the tiny class-offset table
   * (≤ O(√seqLen) distinct classes).
   */
  def packWholeDocs(docs: DataFrame, textCol: String, idCol: String,
                    seqLen: Long, idChunk: Long = 1L << 16): DataFrame = {
    require(seqLen > 0 && idChunk > 0)
    import org.apache.spark.sql.expressions.Window
    val classed = docs
      .select(col(idCol), wsTokenCount(col(textCol)).as("__n"))
      .withColumn("__nt", least(col("__n"), lit(seqLen)))
      .withColumn("__c", expr(s"${seqLen}L div __nt"))
    val ranked = Windows.runningSumChunked(classed, Seq("__c"),
        expr(s"CAST($idCol AS BIGINT) div ${idChunk}L"), Seq(col(idCol)),
        lit(1L), "__rk")
      .withColumn("__r", col("__rk") - 1)
    // class bin-count prefix offsets: ≤ O(√seqLen) rows (distinct
    // values of seqLen div nt), the bounded partition-less-window
    // shape t18/l80 use
    // renamed key: offsets shares lineage with `ranked` (both derive
    // from `classed`), so a same-name equi-join would be ambiguous
    val offsets = classed.groupBy(col("__c")).agg(count(lit(1)).as("__cnt"))
      .select(col("__c").as("__oc"),
        coalesce(sum(expr("(__cnt + __c - 1) div __c"))
          .over(Window.orderBy(col("__c"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off"))
    ranked.join(broadcast(offsets), col("__c") === col("__oc"))
      .select(
        (col("__off") + expr("__r div __c")).as("bin_id"),
        col(idCol),
        col("__n").as("n_tok"),
        col("__nt").as("tok_kept"),
        (col("__n") > lit(seqLen)).as("truncated"))
  }
}
