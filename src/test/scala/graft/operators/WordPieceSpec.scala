package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WordPiece (BERT lineage): likelihood-scored merge training (NOT raw
  * pair count — pinned by a corpus where the two objectives disagree),
  * greedy longest-match encode with ## continuations, [UNK] whole-word
  * fallback, and distributed ≡ driver encode. */
class WordPieceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encodeWord: greedy longest match with ## continuations; [UNK] on any gap") {
    val vocab = Set("[UNK]", "un", "##aff", "##able", "##a", "u", "##n",
      "play", "##ing", "p", "##l", "##ay")
    assert(WordPiece.encodeWord("unaffable", vocab) == Seq("un", "##aff", "##able"))
    assert(WordPiece.encodeWord("playing", vocab) == Seq("play", "##ing"))
    // longest match wins over shorter decompositions
    assert(WordPiece.encodeWord("play", vocab) == Seq("play"))
    // 'z' matches nothing → the WHOLE word is [UNK], not partial pieces
    assert(WordPiece.encodeWord("unz", vocab) == Seq("[UNK]"))
    assert(WordPiece.encodeWord("", vocab) == Seq.empty)
  }

  test("training scores by likelihood, not raw count: rare-symbol pairs win") {
    // 'xy' appears 4 times but x and y are very common (count 10 each
    // via filler words); 'qz' appears 3 times and q/z appear ONLY
    // there. Raw-count BPE merges (x,##y) first; WordPiece's
    // count/(count·count) prefers (q,##z): 3/(3·3) = 0.333 vs
    // 4/(10·10) = 0.04.
    val vocab0 = Seq(
      (WordPiece.symbolize("xy"), 4L),
      (WordPiece.symbolize("qz"), 3L),
      (WordPiece.symbolize("x"), 6L),
      (WordPiece.symbolize("y"), 6L))
    val merges = WordPiece.trainMergesLocal(vocab0, 1)
    assert(merges.head._1 == "q" && merges.head._2 == "##z" &&
      merges.head._3 == "qz" && merges.head._4 == 3L)
    // BPE on the same vocab picks the higher-count pair — the two
    // objectives genuinely disagree here
    val bpe = Bpe.trainMergesLocal(
      Seq((Array("x", "y"), 4L), (Array("q", "z"), 3L),
        (Array("x"), 6L), (Array("y"), 6L)), 1)
    assert(bpe.head._1 == "x" && bpe.head._2 == "y")
  }

  test("merged continuations absorb the ## mark; chains fuse correctly") {
    // one word 'abc' seen 5 times: symbols a ##b ##c; merging twice
    // must produce 'abc' (not 'a####b##c')
    val merges = WordPiece.trainMergesLocal(
      Seq((WordPiece.symbolize("abc"), 5L)), 2)
    assert(merges.map(_._3).toSet.contains("abc") ||
      merges.last._3 == "abc", merges.toString)
    assert(merges.forall(m => !m._3.contains("####")))
  }

  test("a word literally containing the ## marker round-trips (in-band-marker guard)") {
    // '##header' must not match continuation entries at position 0:
    // it encodes via its own '#' initial symbol and '###'-style
    // continuations, and the pieces rebuild the literal word
    val docs = Seq((1L, "##header plain header text ##header")).toDF("doc_id", "text")
    val vocab = WordPiece.trainVocab(docs, "text", nMerges = 10)
    val vset = vocab.toSet
    val pieces = WordPiece.encodeWord("##header", vset)
    assert(pieces != Seq(WordPiece.Unk), pieces.toString)
    assert(pieces.head.startsWith("#") && !pieces.head.startsWith("##"),
      s"word-initial piece must not be a continuation entry: $pieces")
    assert(pieces.map(_.stripPrefix("##")).mkString == "##header", pieces.toString)
    // the plain word is untouched by the guard
    val plain = WordPiece.encodeWord("header", vset)
    assert(plain.map(_.stripPrefix("##")).mkString == "header")
  }

  test("fuzz: 30 random corpora — round-trip, no ## fusion artifacts, train determinism") {
    val rnd = new scala.util.Random(111L)
    val alphabet = "abcdexyz#"
    (0 until 30).foreach { trial =>
      val nWords = 3 + rnd.nextInt(12)
      val words = (0 until nWords).map { _ =>
        (0 until (1 + rnd.nextInt(7)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = (0 until (5 + rnd.nextInt(20)))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      val docs = Seq((trial.toLong, text)).toDF("doc_id", "text")
      val nM = rnd.nextInt(15)
      val vocab = WordPiece.trainVocab(docs, "text", nM)
      assert(vocab.head == "[UNK]" && vocab.distinct.size == vocab.size,
        s"trial $trial: dup entries in $vocab")
      // '####' is a fusion ARTIFACT only when the corpus carries no
      // literal '#'; with '#' in words it is the legitimate
      // continuation symbol for two literal hashes
      if (!text.contains("#"))
        assert(vocab.forall(v => !v.contains("####")), s"trial $trial: $vocab")
      val vset = vocab.toSet
      // every word ACTUALLY IN the corpus round-trips without [UNK]
      // (a sampled-but-unused candidate word may start with a char the
      // training text never saw word-initially — correctly [UNK])
      text.split(" ").distinct.foreach { w =>
        val pieces = WordPiece.encodeWord(w, vset)
        assert(pieces.nonEmpty && pieces != Seq(WordPiece.Unk),
          s"trial $trial: '$w' -> $pieces under $vocab")
        assert(pieces.map(_.stripPrefix("##")).mkString == w,
          s"trial $trial: '$w' -> $pieces")
        // only the first piece may lack the continuation mark
        assert(pieces.tail.forall(_.startsWith("##")), s"trial $trial: $pieces")
      }
      // training is deterministic on the same corpus
      assert(WordPiece.trainVocab(docs, "text", nM) == vocab, s"trial $trial")
    }
  }

  test("training never emits a dead word-initial ## entry (collision-prone merges excluded)") {
    // words of pure '#' runs make fuse('#','###') == "##" the top
    // likelihood candidate — an entry encodeWord's in-band guard would
    // permanently refuse at position 0; training must skip it
    val docs = Seq((1L, "## ## ## ### ###")).toDF("doc_id", "text")
    val vocab = WordPiece.trainVocab(docs, "text", nMerges = 5)
    // genuine continuation entries are "##" + at least one char (length
    // ≥ 3), so the literal two-char "##" can ONLY arise from the dead
    // word-initial merge — it must never reach the vocabulary
    assert(!vocab.contains("##"), s"dead '##' entry in vocab: $vocab")
    // round trip still holds for the marker-heavy corpus
    WordPiece.encodeWordsFast(docs, "text", vocab).collect().foreach { r =>
      val w = r.getString(r.fieldIndex("w"))
      val pieces = r.getSeq[String](r.fieldIndex("pieces"))
      if (pieces != Seq(WordPiece.Unk)) {
        val rebuilt = pieces.zipWithIndex.map {
          case (p, 0) => p
          case (p, _) => p.stripPrefix("##")
        }.mkString
        assert(rebuilt == w, s"round trip broke for '$w': $pieces")
      }
    }
  }

  test("minCount prune: hapax words do not vote on the vocab but still encode") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "banana banana banana zyx")).toDF("doc_id", "text")
    val pruned = WordPiece.trainVocab(docs, "text", nMerges = 5, minCount = 2L)
    assert(!pruned.exists(p => p.contains("z") || p.contains("y") || p.contains("x")),
      s"pruned 'zyx' must contribute neither alphabet nor merges: $pruned")
    // the ENCODE table is never pruned — the hapax row survives, and
    // with its symbols outside the trained alphabet the documented
    // fallback is the [UNK] piece, not a vanished word
    val enc = WordPiece.encodeWordsFast(docs, "text", pruned)
      .where(col("w") === "zyx").collect()
    assert(enc.length == 1 &&
      enc(0).getSeq[String](enc(0).fieldIndex("pieces")) == Seq(WordPiece.Unk))
  }

  test("trainVocab + encodeWordsFast: vocab round-trips every training word; determinism") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown cat sleeps under the warm sun"),
      (3L, "a lazy dog and a quick cat share the brown rug"))
      .toDF("doc_id", "text")
    val vocab = WordPiece.trainVocab(docs, "text", nMerges = 20)
    assert(vocab.head == "[UNK]")
    assert(vocab.distinct.size == vocab.size) // no duplicate entries
    val enc = WordPiece.encodeWordsFast(docs, "text", vocab)
      .as[(String, Seq[String], Boolean)].collect()
    // every training word encodes without [UNK] (its alphabet is in vocab)
    assert(enc.forall(!_._3), enc.filter(_._3).mkString(","))
    // pieces re-concatenate to the word (## marks stripped)
    enc.foreach { case (w, pieces, _) =>
      assert(pieces.map(_.stripPrefix("##")).mkString == w, s"$w -> $pieces")
    }
    // the distributed encode equals the driver encode word-for-word
    val vset = vocab.toSet
    enc.foreach { case (w, pieces, _) =>
      assert(pieces == WordPiece.encodeWord(w, vset))
    }
    // training is deterministic
    assert(WordPiece.trainVocab(docs, "text", nMerges = 20) == vocab)
  }
}
