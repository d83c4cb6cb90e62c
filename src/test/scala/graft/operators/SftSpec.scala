package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Chat-template rendering: exact template string, position-based
  * ordering (raw keys may gap), strict user-first alternation flag,
  * per-role token sums. */
class SftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rendered conversations compose into the dedup cascade (l117 shape)") {
    import org.apache.spark.sql.functions.col
    // 3 identical canned convs (exact dups), 2 one-word variants of a
    // long shared script (near-dups), 1 genuinely distinct conv
    def conv(id: Long, closing: String): Seq[(Long, Long, String, String)] = Seq(
      (id, 0L, "user", "hello i need help with my order and the site keeps failing"),
      (id, 1L, "assistant", "sure i can help please share the order number and the error"),
      (id, 2L, "user", s"the number is on file and the error says $closing"))
    val turns = (conv(1L, "timeout") ++ conv(2L, "timeout") ++ conv(3L, "timeout") ++
      conv(4L, "denied") ++ conv(5L, "blocked") ++
      Seq((6L, 0L, "user", "completely unrelated question about database tuning"),
        (6L, 1L, "assistant", "indexes and statistics are where to start looking")))
      .toDF("conv_id", "turn_idx", "role", "content")
    val rendered = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
      .select(col("conv_id"), col("rendered"))
    val kept = Dedup.dedupCorpus(rendered, "rendered", "conv_id", 0.8)
      .select("conv_id").as[Long].collect().sorted.toSeq
    // exact stage: 2,3 collapse onto 1; near-dup stage: 4 survives its
    // exact pass but 1/4/5 share almost all shingles — larger ids drop
    assert(kept == Seq(1L, 6L), s"got $kept")
  }

  test("renders the exact template in turn order; per-role token sums; valid flag") {
    val turns = Seq(
      (1L, 10L, "user", "hello there"),        // gapped, unordered keys:
      (1L, 30L, "user", "thanks a lot"),       // position renumbering sorts them
      (1L, 20L, "assistant", "hi how can i help"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val out = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
      .select("n_turns", "valid_alternation", "user_tokens", "assistant_tokens", "rendered")
      .as[(Long, Boolean, Long, Long, String)].head()
    assert(out._1 == 3L && out._2)
    assert(out._3 == 5L)  // "hello there"(2) + "thanks a lot"(3)
    assert(out._4 == 5L)  // "hi how can i help"
    assert(out._5 ==
      "<|user|>\nhello there\n<|end|>\n" +
        "<|assistant|>\nhi how can i help\n<|end|>\n" +
        "<|user|>\nthanks a lot\n<|end|>\n")
  }

  test("turn_spans/assistant_spans slice the rendered string back to each turn's content") {
    val turns = Seq(
      (1L, 0L, "user", "hello there"),
      (1L, 1L, "assistant", "hi how can i help"),
      (1L, 2L, "user", "thanks a lot"),
      (1L, 3L, "assistant", "you are welcome"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val row = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
      .select("rendered", "turn_spans", "assistant_spans")
      .as[(String, Seq[(String, Long, Long)], Seq[(Long, Long)])].head()
    val (rendered, spans, aSpans) = row
    // every turn's [start, end) slice is exactly its content
    val contents = Seq("hello there", "hi how can i help", "thanks a lot", "you are welcome")
    assert(spans.map(_._1) == Seq("user", "assistant", "user", "assistant"))
    spans.zip(contents).foreach { case ((_, s, e), c) =>
      assert(rendered.substring(s.toInt, e.toInt) == c,
        s"[$s,$e) sliced '${rendered.substring(s.toInt, e.toInt)}' != '$c'")
    }
    // assistant_spans = the assistant subset, same offsets
    assert(aSpans == spans.filter(_._1 == "assistant").map(t => (t._2, t._3)))
    // hand-check the first span: "<|user|>\n" is 9 chars
    assert(spans.head._2 == 9L && spans.head._3 == 9L + 11L)
  }

  test("spans count tags in code points: astral characters in custom tags don't shift slices") {
    // the robot emoji is 1 code point but 2 UTF-16 units — Java
    // .length-based offsets would over-advance every span after it
    val turns = Seq(
      (1L, 0L, "user", "hi there"),
      (1L, 1L, "assistant", "hello you"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val (rendered, spans) = Sft.renderConversations(
        turns, "conv_id", "turn_idx", "role", "content",
        userTag = "<|u🤖|>", asstTag = "<|a🤖|>")
      .select("rendered", "turn_spans")
      .as[(String, Seq[(String, Long, Long)])].head()
    // slice by CODE POINTS (Spark substring semantics)
    def cpSlice(s: String, from: Long, until: Long): String = {
      val a = s.offsetByCodePoints(0, from.toInt)
      val b = s.offsetByCodePoints(0, until.toInt)
      s.substring(a, b)
    }
    assert(cpSlice(rendered, spans(0)._2, spans(0)._3) == "hi there")
    assert(cpSlice(rendered, spans(1)._2, spans(1)._3) == "hello you")
  }

  test("preferencePairs: null/blank, identical, normalized-twin, and contaminated pairs all flagged") {
    val pairs = Seq(
      (1L, "what is the capital of france today tell me now please",
        "the capital is paris", "the capital is lyon"),          // keep
      (2L, "how do magnets work in simple terms for a child",
        "magnets attract iron", null),                           // null rejected
      (3L, "why is the sky blue during the day every day",
        "rayleigh scattering", "rayleigh scattering"),           // identical
      (4L, "when did the war end and who signed the treaty",
        "it ended in 1945", "It ended in 1945!!"),               // normalized twin
      (5L, "name a big ocean on the planet earth right now",
        "the pacific ocean", "   "))                             // blank rejected
      .toDF("id", "prompt", "chosen", "rejected")
    // benchmark contains pair 1's prompt → its 8-grams collide
    val bench = Seq("what is the capital of france today tell me now please").toDF("q")
    val grams = Decontaminate.benchGrams(bench, "q", n = 8)
    val got = Sft.preferencePairs(pairs, "id", "prompt", "chosen", "rejected", grams, n = 8)
      .select("id", "has_fields", "distinct_responses", "prompt_contaminated", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((true, true, true, false)))   // valid but contaminated
    assert(got(2L) == ((false, false, false, false)))
    assert(got(3L) == ((true, false, false, false)))
    assert(got(4L) == ((true, false, false, false))) // twin dies to the NORMALIZED compare
    assert(got(5L) == ((false, true, false, false)))
  }

  test("alternation violations flag false but still render") {
    val turns = Seq(
      (1L, 0L, "assistant", "i speak first"),   // assistant at position 0
      (2L, 0L, "user", "a"), (2L, 1L, "user", "b"), // double user
      (3L, 0L, "user", "ok"), (3L, 1L, "assistant", "fine"))
      .toDF("conv_id", "turn_idx", "role", "content")
    val out = Sft.renderConversations(turns, "conv_id", "turn_idx", "role", "content")
      .select("conv_id", "valid_alternation", "rendered")
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!out(1L)._1 && out(1L)._2.startsWith("<|assistant|>"))
    assert(!out(2L)._1)
    assert(out(3L)._1)
  }
}
