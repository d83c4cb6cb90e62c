package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFunctions

/** BPE merge statistics + iterative trainer vs a driver-side reference
  * implementation, and the URL-canonicalization column functions l64
  * certifies cross-engine. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pairCounts weights pairs by word frequency over the distinct vocab") {
    // pair "ab": 2 from word "ab" (corpus count 2) + 1 from "abc";
    // "bc": 1 from "abc"; single-char word "a" contributes nothing
    val docs = Seq((1L, "ab ab a"), (2L, "abc")).toDF("doc_id", "text")
    val out = Bpe.pairCounts(docs, "text")
      .orderBy(desc("cnt"), col("pair"))
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("ab", 3L), ("bc", 1L)))
  }

  /** Reference BPE (Sennrich et al.): greedy left-to-right merge over a
    * word-frequency map, argmax by (count, then lexicographic pair). */
  private def referenceBpe(words: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => (w.split("").toList, ws.size.toLong) }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 1 to nMerges if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val eligible = counts.filter(_._2 >= 2L)
      if (eligible.isEmpty) done = true
      else {
        val ((a, b), c) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(List.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == a && s == b)
              acc.init :+ (a + b)
            else acc :+ s
          }
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("trainMerges matches the reference implementation, incl. overlap and merged-symbol chains") {
    // "aaab" stresses left-first overlap ("aaa" under (a,a) → aa,a) and
    // chained merges ((aa,ab) etc.); "low"/"lower" is the classic pair
    val words = Seq("low", "low", "low", "lower", "lower", "aaab", "aaab", "aaab")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val expected = referenceBpe(words, 6)
    val got = Bpe.trainMerges(docs, "text", 6)
    assert(got == expected)
    assert(got.nonEmpty && got.forall(_._3 >= 2L))
  }

  test("encodeWords applies trained merges in order — matches the reference encoding") {
    val words = Seq("low", "low", "low", "lower", "lower", "aaab", "aaab", "aaab")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 4).map(m => (m._1, m._2))
    // reference encode: same greedy fold per merge, in training order
    def encode(w: String): List[String] =
      merges.foldLeft(w.split("").toList) { case (syms, (a, b)) =>
        syms.foldLeft(List.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
          else acc :+ s
        }
      }
    val got = Bpe.encodeWords(docs, "text", merges)
      .as[(String, Seq[String])].collect().toMap
    assert(got.keySet == words.toSet)
    words.distinct.foreach(w => assert(got(w) == encode(w), s"word $w"))
    // the trained merges actually compress: fewer symbols than chars
    assert(got("lower").size < 5 && got("aaab").size < 4)
  }

  test("trainMerges stops early when no pair repeats") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every pair occurs once → zero merges regardless of the budget
    assert(Bpe.trainMerges(docs, "text", 5).isEmpty)
  }

  test("URL canonicalization: host, domain, and normal form") {
    val cases = Seq(
      // www + default https port + utm first in query + fragment
      ("https://WWW.Sub0.Site3.com:443/p/1?utm_source=a&id=2#frag",
        "www.sub0.site3.com", "site3.com", "https://sub0.site3.com/p/1?id=2"),
      // non-default port kept; trailing utm param; no fragment
      ("https://a.B.example.org:8080/x?id=3&utm_campaign=c",
        "a.b.example.org", "example.org", "https://a.b.example.org:8080/x?id=3"),
      // utm-only query collapses to no query at all
      ("http://example.com:80/q?utm_medium=m",
        "example.com", "example.com", "http://example.com/q"),
      // nothing to normalize
      ("https://plain.net/path", "plain.net", "plain.net", "https://plain.net/path"))
    val out = cases.map(_._1).toDF("url")
      .select(TextFunctions.urlHost(col("url")),
        TextFunctions.registrableDomain(col("url")),
        TextFunctions.normalizeUrl(col("url")))
      .as[(String, String, String)].collect().toSeq
    assert(out == cases.map(c => (c._2, c._3, c._4)))
  }
}
