package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Chat-template rendering: exact template string, position-based
  * ordering (raw keys may gap), strict user-first alternation flag,
  * per-role token sums. */
class SftSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

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
