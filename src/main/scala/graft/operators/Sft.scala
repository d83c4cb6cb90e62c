package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SFT (instruction-tuning) data preparation — the post-pretraining
 * pipeline surface: long-format conversation turns (one row per turn)
 * validated and rendered into the single training string a chat
 * template defines. North-star extension: the reference
 * (/root/reference/src/lib.rs:1-957) has no text surface.
 *
 * Semantics: turns order by POSITION within the conversation (the sort
 * key column renumbers to 0..n−1 — gaps in the raw key don't matter);
 * a conversation is `valid_alternation` iff position-even turns are
 * `user` and position-odd turns are `assistant` (the
 * user-starts-strict-alternation contract most chat templates
 * require); rendering emits `tag \n content \n endTag \n` per turn in
 * order regardless of validity (the flag is the filter, the render is
 * total).
 *
 * 100 TB shape: ONE groupBy(conversation) — collect_list partials
 * merge map-side and conversations are bounded (chat-length), so no
 * task ever holds more than one conversation's turns; everything
 * downstream (sort, alternation check, render, per-role token sums)
 * is in-row array work on the collected struct array.
 */
object Sft {

  /**
   * One row per conversation: `n_turns`, `valid_alternation`,
   * `user_tokens` / `assistant_tokens` (whitespace counts),
   * `rendered` (the template string), `turn_spans` (per-turn
   * `(role, start, end)` CONTENT offsets into `rendered`, 0-based
   * half-open [start, end) in characters), and `assistant_spans`
   * (`(start, end)` filtered to assistant turns — the loss-mask input
   * an SFT trainer needs: mask loss to exactly these slices).
   *
   * The offsets are a pure in-row fold over the same sorted struct
   * array (integer-exact running sum of
   * `len(tag) + 1 + len(content) + 1 + len(endTag) + 1` segments), so
   * by construction `substring(rendered, start+1, end−start)` is the
   * turn's verbatim content — no re-parsing of the template.
   */
  def renderConversations(turns: DataFrame, convCol: String, idxCol: String,
                          roleCol: String, contentCol: String,
                          userTag: String = "<|user|>",
                          asstTag: String = "<|assistant|>",
                          endTag: String = "<|end|>"): DataFrame = {
    def wsTok(c: Column): Column =
      (length(c) - length(replace(c, lit(" "), lit(""))) + 1).cast("long")
    val sorted = array_sort(collect_list(struct(
      col(idxCol).as("i"), col(roleCol).as("r"), col(contentCol).as("c"))))
    // tag lengths in CODE POINTS (what Spark's length/substring count),
    // not UTF-16 units — a custom tag with an astral character would
    // otherwise shift every span after it
    def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
    def tagLen(t: Column): Column =
      when(t("r") === "user", lit(cpLen(userTag)))
        .otherwise(lit(cpLen(asstTag)))
    turns
      .groupBy(col(convCol))
      .agg(sorted.as("__sft_t"))
      .withColumn("n_turns", size(col("__sft_t")).cast("long"))
      .withColumn("valid_alternation",
        forall(zip_with(col("__sft_t"),
            sequence(lit(0), size(col("__sft_t")) - 1),
            (t, i) => t("r") === when(i % 2 === 0, "user").otherwise("assistant")),
          x => x))
      .withColumn("user_tokens",
        aggregate(filter(col("__sft_t"), t => t("r") === "user"),
          lit(0L), (acc, t) => acc + wsTok(t("c"))))
      .withColumn("assistant_tokens",
        aggregate(filter(col("__sft_t"), t => t("r") === "assistant"),
          lit(0L), (acc, t) => acc + wsTok(t("c"))))
      .withColumn("rendered",
        aggregate(col("__sft_t"), lit(""), (acc, t) => concat(acc,
          when(t("r") === "user", lit(userTag)).otherwise(lit(asstTag)),
          lit("\n"), t("c"), lit("\n"), lit(endTag), lit("\n"))))
      // running character offset + per-turn content spans in one fold:
      // the accumulator carries (next segment start, spans so far)
      .withColumn("turn_spans",
        aggregate(col("__sft_t"),
          struct(lit(0L).as("o"),
            array().cast("array<struct<r:string,s:bigint,e:bigint>>").as("sp")),
          (acc, t) => {
            val cs = acc("o") + tagLen(t) + 1L
            val ce = cs + length(t("c")).cast("long")
            struct(
              (ce + lit(cpLen(endTag)) + 2L).as("o"),
              concat(acc("sp"), array(struct(
                t("r").as("r"), cs.as("s"), ce.as("e")))).as("sp"))
          },
          acc => acc("sp")))
      .withColumn("assistant_spans",
        transform(filter(col("turn_spans"), s => s("r") === "assistant"),
          s => struct(s("s").as("s"), s("e").as("e"))))
      .drop("__sft_t")
  }

  /**
   * Preference-pair (DPO/RLHF) data preparation — the standard
   * post-training step after SFT prep: validate (prompt, chosen,
   * rejected) triples and flag prompts that collide with an evaluation
   * benchmark, so reward-model / DPO training neither learns from
   * degenerate pairs nor leaks eval data.
   *
   * Adds per pair: `has_fields` (all three present and non-blank),
   * `distinct_responses` (chosen ≠ rejected under
   * [[graft.functions.TextFunctions.normalizeText]] — a pair differing
   * only in case/punctuation/spacing carries no preference signal),
   * `n_hit_grams` / `prompt_contaminated` (the prompt shares a
   * normalized word `n`-gram with `grams` —
   * [[Decontaminate.benchGrams]] output, composing the l97 scrub), and
   * `keep` = valid ∧ distinct ∧ clean.
   *
   * 100 TB shape: the validity checks are pure per-row projections;
   * contamination is the [[Decontaminate.flagContaminated]] geometry —
   * token-linear explode, BROADCAST benchmark-gram semi-join (eval
   * suites are small by definition), per-pair count agg and attach
   * join both keyed by the pair id. Nothing row-scale broadcasts.
   */
  def preferencePairs(pairs: DataFrame, idCol: String, promptCol: String,
                      chosenCol: String, rejectedCol: String,
                      grams: DataFrame, n: Int = 8): DataFrame = {
    import graft.functions.TextFunctions.normalizeText
    // the contamination geometry IS the l97 scrub — call it rather
    // than restate it (one place to fix the gram join)
    Decontaminate.flagContaminated(pairs, promptCol, idCol, grams, n)
      .withColumnRenamed("contaminated", "prompt_contaminated")
      .withColumn("has_fields",
        col(promptCol).isNotNull && col(chosenCol).isNotNull &&
          col(rejectedCol).isNotNull &&
          trim(col(promptCol)) =!= "" && trim(col(chosenCol)) =!= "" &&
          trim(col(rejectedCol)) =!= "")
      .withColumn("distinct_responses",
        coalesce(
          normalizeText(col(chosenCol)) =!= normalizeText(col(rejectedCol)),
          lit(false)))
      .withColumn("keep",
        col("has_fields") && col("distinct_responses") &&
          !col("prompt_contaminated"))
  }
}
