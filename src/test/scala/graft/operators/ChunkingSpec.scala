package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Sentence-boundary token-budget chunking: home-chunk assignment is the
  * running-sum bucket, overlap re-emits boundary-tail sentences, and no
  * sentence is ever split. */
class ChunkingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 6 sentences × 4 tokens each, budget 8 → chunks of 2 sentences
  private val even = "a b c one. a b c two. a b c three. " +
    "a b c four. a b c five. a b c six."

  test("exact budget fill: home chunks are running-sum buckets, text in doc order") {
    val out = Chunking.sentenceChunks(
        Seq((1L, even)).toDF("doc_id", "text"), "text", "doc_id",
        maxTokens = 8)
      .orderBy("chunk_id")
      .select("chunk_id", "n_sentences", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 8L, "a b c one. a b c two."),
      (1L, 2L, 8L, "a b c three. a b c four."),
      (2L, 2L, 8L, "a b c five. a b c six.")))
  }

  test("overlap re-emits the boundary tail into the next chunk, never past the last") {
    val out = Chunking.sentenceChunks(
        Seq((1L, even)).toDF("doc_id", "text"), "text", "doc_id",
        maxTokens = 8, overlapTokens = 4)
      .orderBy("chunk_id")
      .select("chunk_id", "n_sentences", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    // each chunk's last sentence ends within 4 tokens of the boundary →
    // repeats at the head of the next chunk; chunk 2 is the last (no
    // phantom chunk 3 from its tail)
    assert(out == Seq(
      (0L, 2L, "a b c one. a b c two."),
      (1L, 3L, "a b c two. a b c three. a b c four."),
      (2L, 3L, "a b c four. a b c five. a b c six.")))
  }

  test("a sentence crossing the boundary stays whole in its home chunk") {
    // 3 + 6 + 3 tokens, budget 5: sentence 2 starts at 3 → home chunk 0
    // (soft budget, never split); sentence 3 starts at 9 → chunk 1
    val doc = "one two three. a b c d e f. seven eight nine."
    val out = Chunking.sentenceChunks(
        Seq((1L, doc)).toDF("doc_id", "text"), "text", "doc_id",
        maxTokens = 5)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 9L, "one two three. a b c d e f."),
      (1L, 3L, "seven eight nine.")))
  }

  test("every sentence appears in its home chunk exactly once; coverage is total") {
    val docs = (0L until 50L).map { i =>
      val n = 1 + (i % 7).toInt
      (i, (1 to n).map(k => s"sent $i $k word filler end.").mkString(" "))
    }.toDF("doc_id", "text")
    val chunks = Chunking.sentenceChunks(docs, "text", "doc_id",
      maxTokens = 11, overlapTokens = 3).cache()
    // reconstruct: dropping each chunk's overlap head (sentences already
    // seen) and concatenating in chunk order restores the document
    val rebuilt = chunks.orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_text").as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.flatMap(_._2.split("(?<=\\.) ")).distinct.mkString(" ")
      }
    val orig = docs.as[(Long, String)].collect().toMap
    orig.foreach { case (id, text) =>
      assert(rebuilt(id) == text, s"doc $id not covered: ${rebuilt(id)}")
    }
    chunks.unpersist()
  }

  test("over-budget sentence skips home ids without minting a duplicate-only chunk") {
    // 2 + 14 + 3 tokens, budget 4, overlap 2: the 14-token sentence has
    // home 0 (starts at 2) and ends at 16, far past chunk 1's boundary;
    // the next sentence starts at 16 → home 4. Chunk ids jump 0 → 4 —
    // chunk 1 must NOT appear as a chunk containing only the re-emitted
    // long sentence (no sentence's home is 1).
    val doc = "one two. a b c d e f g h i j k l m n. x y z."
    val out = Chunking.sentenceChunks(
        Seq((1L, doc)).toDF("doc_id", "text"), "text", "doc_id",
        maxTokens = 4, overlapTokens = 2)
      .orderBy("chunk_id")
      .select("chunk_id", "n_sentences", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, "one two. a b c d e f g h i j k l m n."),
      (4L, 1L, "x y z.")))
  }

  test("overlapTokens must stay below maxTokens") {
    intercept[IllegalArgumentException] {
      Chunking.sentenceChunks(Seq((1L, "x.")).toDF("doc_id", "text"),
        "text", "doc_id", maxTokens = 4, overlapTokens = 4)
    }
  }
}
