package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Unigram-LM tokenizer (SentencePiece family): the distributed EM
  * trainer's guarantee is BIT-IDENTITY with the driver-side reference
  * loop (exact integer sufficient statistics make that a meaningful
  * assertion, not a tolerance), plus structural properties of the
  * Viterbi decode. */
class UnigramSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "the cat sat on the mat and the dog sat on the log",
    "a cat and a dog met on the mat by the log",
    "the dog and the cat ran to the mat on the log",
    "dogs and cats sat on mats by logs in the fog")

  private def corpusDf = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def localWc = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .foreach(w => m.update(w, m.getOrElse(w, 0L) + 1))
    m.toSeq.sortBy(_._1)
  }

  test("distributed trainUnigram is bit-identical to the local reference loop") {
    val dist = Unigram.trainUnigram(corpusDf, "text", vocabSize = 24,
      seedSize = 60, maxPieceLen = 4, emRounds = 2)
    val local = Unigram.trainUnigramLocal(localWc, vocabSize = 24,
      seedSize = 60, maxPieceLen = 4, emRounds = 2)
    assert(dist == local,
      s"dist=${dist.take(8)}... local=${local.take(8)}...")
    // probabilities are a distribution over the vocab
    assert(math.abs(dist.map(_._2).sum - 1.0) < 1e-9)
    // every observed character survives pruning (coverage floor)
    val chars = corpus.flatMap(_.split(" ")).flatMap(_.toSeq).map(_.toString).toSet
    assert(chars.subsetOf(dist.map(_._1).toSet))
  }

  test("EM concentrates mass on planted repeated units and Viterbi recovers them") {
    // words are concatenations of three planted units — a vocab budget
    // just above the alphabet forces EM to choose which multi-char
    // pieces earn their keep
    val planted = Seq("foo", "bar", "qux")
    val words = Seq("foobar", "barqux", "fooqux", "foobarqux",
      "barfoo", "quxbar", "foofoo", "quxqux")
    val docs = (0 until 24).map(i => (i.toLong,
      Seq(words(i % words.length), words((i * 3 + 1) % words.length)).mkString(" ")))
      .toDF("doc_id", "text")
    val vocab = Unigram.trainUnigram(docs, "text", vocabSize = 12,
      seedSize = 40, maxPieceLen = 3, emRounds = 2)
    val probs = vocab.toMap
    // each planted unit outweighs every single character
    val charMax = vocab.filter(_._1.length == 1).map(_._2).max
    planted.foreach { u =>
      assert(probs.getOrElse(u, 0.0) > charMax,
        s"$u=${probs.get(u)} vs charMax=$charMax in $vocab")
    }
    val lp = vocab.map { case (p, pr) => (p, math.log(pr)) }.toMap
    assert(Unigram.viterbiWord("foobarqux", lp, 3) == Seq("foo", "bar", "qux"))
    assert(Unigram.viterbiWord("quxfoo", lp, 3) == Seq("qux", "foo"))
  }

  test("trainer terminates when vocabSize is below the alphabet size (prune fixed point)") {
    // the alphabet floor: single chars are never pruned, so a budget
    // below |alphabet| must stop at the alphabet, not spin forever
    // (regression: l95's 26-letter corpus with vocabSize=24 hung)
    val wc = localWc
    val alphabet = wc.flatMap(_._1.toSeq).map(_.toString).distinct.sorted
    val v = Unigram.trainUnigramLocal(wc, vocabSize = alphabet.size - 3,
      seedSize = 60, maxPieceLen = 4, emRounds = 2)
    assert(v.map(_._1).sorted == alphabet)
    val dist = Unigram.trainUnigram(corpusDf, "text",
      vocabSize = alphabet.size - 3, seedSize = 60, maxPieceLen = 4, emRounds = 2)
    assert(dist == v)
  }

  test("viterbiWord: concatenation identity, unknown-char fallback, tie prefers longer piece") {
    val lp = Map("ab" -> math.log(0.25), "a" -> math.log(0.25),
      "b" -> math.log(0.25), "c" -> math.log(0.25))
    // p(ab) == p(a)*... no: one piece at 0.25 beats two at 0.0625
    assert(Unigram.viterbiWord("ab", lp, 8) == Seq("ab"))
    // exact tie: p(ab)=p(a)·p(b) when p(ab)=0.0625 — longer piece wins
    val tie = Map("ab" -> math.log(0.0625), "a" -> math.log(0.25), "b" -> math.log(0.25))
    assert(Unigram.viterbiWord("ab", tie, 8) == Seq("ab"))
    // unknown char: single-char floor keeps the decode total
    assert(Unigram.viterbiWord("axb", lp, 8) == Seq("a", "x", "b"))
    assert(Unigram.viterbiWord("", lp, 8).isEmpty)
    // concatenation identity on arbitrary input
    val w = "abcabcxabc"
    assert(Unigram.viterbiWord(w, lp, 8).mkString == w)
  }

  test("viterbiEncode matches per-word viterbiWord over the corpus vocabulary") {
    val vocab = Unigram.trainUnigram(corpusDf, "text", vocabSize = 24,
      seedSize = 60, maxPieceLen = 4, emRounds = 2)
    val lp = vocab.map { case (p, pr) => (p, math.log(pr)) }.toMap
    val enc = Unigram.viterbiEncode(corpusDf, "text", vocab, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val words = corpus.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
    assert(enc.keySet == words.toSet)
    words.foreach { w =>
      assert(enc(w) == Unigram.viterbiWord(w, lp, 4), s"word=$w")
      assert(enc(w).mkString == w)
    }
  }
}
