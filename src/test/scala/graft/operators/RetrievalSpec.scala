package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** BM25 against a hand-computed reference on a toy corpus. */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25 matches the hand formula; no-hit docs are absent") {
    val docs = Seq((1L, "a b a c"), (2L, "a d"), (3L, "e e e"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "text", "doc_id", Seq("a", "c"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)

    val (n, toks) = (3.0, 9.0)
    val avgdl = toks / n
    def idf(df: Double) = math.log(1 + (n - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * (dl / avgdl)))
    val d1 = w(2, 4, 2) + w(1, 4, 1) // a×2, c×1 in a 4-token doc
    val d2 = w(1, 2, 2)              // a×1 in a 2-token doc

    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 2L), (2L, 1L)))
    assert(math.abs(out(0)._3 - d1) < 1e-5, s"${out(0)._3} vs $d1")
    assert(math.abs(out(1)._3 - d2) < 1e-5, s"${out(1)._3} vs $d2")
    // the two-term doc outranks the one-term doc
    assert(out(0)._3 > out(1)._3)
  }
}
