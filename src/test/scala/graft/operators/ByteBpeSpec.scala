package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Byte-level GPT-2-lineage BPE: bytes→unicode bijection, published
  * pre-tokenizer semantics, byte-vs-char divergence exactly where the
  * two levels should disagree (multibyte + whitespace), and the
  * distributed encoder against the driver reference. */
class ByteBpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bytes→unicode table: bijective, printables self-map, space is Ġ") {
    assert(ByteBpe.byteEncoder.length == 256)
    assert(ByteBpe.byteEncoder.distinct.length == 256, "must be injective")
    ('!' to '~').foreach(c => assert(ByteBpe.byteEncoder(c.toInt) == c))
    assert(ByteBpe.byteEncoder(' '.toInt) == 'Ġ') // Ġ
    assert(ByteBpe.byteEncoder('\n'.toInt) == 'Ċ') // Ċ
    // shifted bytes land at 256+n — all BMP, all single UTF-16 units
    assert(ByteBpe.byteEncoder.forall(c => !Character.isSurrogate(c)))
    (0 until 256).foreach(b => assert(ByteBpe.byteDecoder(ByteBpe.byteEncoder(b)) == b))
  }

  test("toByteUnits/fromByteUnits round-trip arbitrary unicode, incl. astral") {
    val rnd = new scala.util.Random(114L)
    val samples = Seq("", "hello world", "café", "naïve — déjà vu",
      "日本語のテキスト", "emoji 😀 and more", "tab\there\nnewline") ++
      (0 until 100).map { _ =>
        val n = rnd.nextInt(20)
        (0 until n).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "x" else new String(Character.toChars(cp))
        }.mkString
      }
    samples.foreach { s =>
      val units = ByteBpe.toByteUnits(s)
      assert(units.length == s.getBytes("UTF-8").length, "one unit per byte")
      assert(ByteBpe.fromByteUnits(units) == s)
    }
  }

  test("pre-tokenizer: contractions, space-attachment, digit/punct runs") {
    def toks(text: String): Seq[String] =
      ByteBpe.preTokenCounts(Seq((1L, text)).toDF("doc_id", "text"), "text")
        .select("tok").as[String].collect().toSeq
    assert(toks("don't stop").toSet == Set("don", "'t", " stop"))
    assert(toks("we'll we're we've I'm he's she'd").toSet ==
      Set("we", "'ll", " we", "'re", "'ve", " I", "'m", " he", "'s", " she", "'d"))
    // spaces attach to the FOLLOWING token; an extra space stands alone
    val df = Seq((1L, "a  b")).toDF("doc_id", "text")
    val withCounts = ByteBpe.preTokenCounts(df, "text")
      .as[(String, Long)].collect().toMap
    assert(withCounts == Map("a" -> 1L, " " -> 1L, " b" -> 1L))
    assert(toks("abc123, ok!").toSet == Set("abc", "123", ",", " ok", "!"))
  }

  test("pre-tokenizer treats Unicode whitespace as whitespace (the (?U) flag)") {
    // NBSP must behave like the Python regex module's \s — a
    // whitespace run, NOT absorbed into a punctuation token
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val toks = ByteBpe.preTokenCounts(df, "text")
      .select("tok").as[String].collect().toSet
    assert(toks == Set("a", " ", "b"), s"got $toks")
    // driver-side pattern agrees with the Spark-side extraction
    val pat = java.util.regex.Pattern.compile(ByteBpe.PreTokenPattern)
    val m = pat.matcher("a b")
    val driver = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toSeq
    assert(driver == Seq("a", " ", "b"))
  }

  test("tokenCounts reports 0 for zero-pre-token documents instead of dropping them") {
    val docs = Seq((1L, "sun moon"), (2L, "")).toDF("doc_id", "text")
    val got = ByteBpe.tokenCounts(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Long)].collect().toMap
    // empty merges: "sun"=3 byte units + " moon"=5 (Ġ+4) = 8; the
    // empty doc must appear with 0, not vanish from the frame
    assert(got == Map(1L -> 8L, 2L -> 0L), s"got $got")
  }

  test("the pre-tokenizer TILES text: tokens concatenate back to the input") {
    // l119's oracle (empty merges ⇒ n_tokens = octet_length) relies on
    // every character falling in exactly one alternative
    val pat = java.util.regex.Pattern.compile(ByteBpe.PreTokenPattern)
    val rnd = new scala.util.Random(119L)
    val samples = Seq("hello world", "tabs\t\tand\nnewlines", "don't stop 123!!",
      "日本語 mixed ascii", "", "   ", "x́combining", "a b") ++
      (0 until 200).map { _ =>
        (0 until rnd.nextInt(30)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "x" else new String(Character.toChars(cp))
        }.mkString
      }
    samples.foreach { s =>
      val m = pat.matcher(s)
      val toks = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toSeq
      assert(toks.mkString == s, s"tiling gap in ${s.take(40)}")
    }
  }

  test("byte-level and char-level disagree exactly on multibyte + whitespace") {
    // multibyte: 'é' is ONE code-point symbol char-level, TWO bytes here
    assert(ByteBpe.toByteUnits("café").length == 5)
    assert("café".length == 4)
    // whitespace: word-level BPE never sees spaces; byte-level keeps
    // ' the' and 'the' as distinct statistics
    val docs = Seq((1L, "the cat the dog")).toDF("doc_id", "text")
    val wordLevel = Bpe.wordCounts(docs, "text").as[(String, Long)].collect().toMap
    assert(wordLevel("the") == 2L && !wordLevel.keys.exists(_.contains(" ")))
    val byteLevel = ByteBpe.preTokenCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(byteLevel == Map("the" -> 1L, " cat" -> 1L, " the" -> 1L, " dog" -> 1L))
  }

  test("encode: concatenation identity and byte-exact round trip to text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick café visit — très bon"),
      (3L, "call me at 12:30, okay?")).toDF("doc_id", "text")
    val merges = ByteBpe.trainMerges(docs, "text", nMerges = 15).map(m => (m._1, m._2))
    val rank = merges.zipWithIndex.toMap
    val toks = ByteBpe.preTokenCounts(docs, "text").select("tok").as[String].collect()
    toks.foreach { t =>
      val pieces = ByteBpe.encodeToken(t, rank)
      assert(pieces.mkString == ByteBpe.toByteUnits(t), s"concat identity for '$t'")
      assert(ByteBpe.fromByteUnits(pieces.mkString) == t, s"byte round trip for '$t'")
    }
  }

  test("distributed encodeTokensFast equals the driver encode") {
    val docs = Seq(
      (1L, "still waters run deep where the old stone bridge crosses over"),
      (2L, "many hands make light work when the harvest moon rises early"))
      .toDF("doc_id", "text")
    val merges = ByteBpe.trainMerges(docs, "text", nMerges = 10).map(m => (m._1, m._2))
    val rank = merges.zipWithIndex.toMap
    val fast = ByteBpe.encodeTokensFast(docs, "text", merges)
      .collect().map(r => (r.getString(0),
        r.getSeq[String](1).toList, r.getLong(2))).sortBy(_._1)
    val slow = ByteBpe.preTokenCounts(docs, "text").select("tok").as[String]
      .collect().map { t =>
        val p = ByteBpe.encodeToken(t, rank)
        (ByteBpe.toByteUnits(t), p.toList, p.length.toLong)
      }.sortBy(_._1)
    assert(fast.toSeq == slow.toSeq)
  }

  test("tokenCounts: per-document totals match a brute-force occurrence sum") {
    val docs = Seq(
      (1L, "aa aa bb"),
      (2L, "aa bb bb aa")).toDF("doc_id", "text")
    val merges = ByteBpe.trainMerges(docs, "text", nMerges = 5).map(m => (m._1, m._2))
    val rank = merges.zipWithIndex.toMap
    val got = ByteBpe.tokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    val pat = java.util.regex.Pattern.compile(ByteBpe.PreTokenPattern)
    val expected = Seq((1L, "aa aa bb"), (2L, "aa bb bb aa")).map { case (id, text) =>
      val m = pat.matcher(text)
      var n = 0L
      while (m.find()) n += ByteBpe.encodeToken(m.group(), rank).length.toLong
      (id, n)
    }.toMap
    assert(got == expected)
  }

  test("l126 local trainer equals the distributed trainer on the fixture corpus") {
    val docs = graft.queries.LlmQueries.byteBpeTrainCorpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val distributed = ByteBpe.trainMerges(docs, "text", 40).map(m => (m._1, m._2))
    assert(graft.queries.LlmQueries.l126Merges == distributed)
  }

  test("rank-order replace unroll equals the lowest-rank encode loop (l126 oracle law)") {
    // the driver-side mirror of the DuckDB replace chain: apply each
    // merge to exhaustion in RANK order, left-to-right — exact for
    // trained tables (constituents created earlier, results distinct),
    // the preconditions l126Merges asserts
    def sequential(units: String, merges: Seq[(String, String)]): Seq[String] = {
      var syms: Seq[String] = units.map(_.toString)
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == a && s == b) out(out.length - 1) = a + b
          else out += s
        }
        syms = out.toSeq
      }
      syms
    }
    val merges = graft.queries.LlmQueries.l126Merges
    val rank = merges.zipWithIndex.toMap
    val rnd = new scala.util.Random(126L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    (0 until 2000).foreach { i =>
      val tok = (if (rnd.nextBoolean()) "Ġ" else "") +
        (0 until (1 + rnd.nextInt(12))).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString
      val loop = Bpe.encodeWord(tok, rank)
      val seq = sequential(tok, merges)
      assert(loop == seq, s"case $i '$tok': loop=$loop seq=$seq")
    }
  }

  test("trained and empty tables agree on merge-free documents") {
    // uppercase text: the lowercase-trained table has no applicable
    // pair anywhere, so trained pricing must equal the byte count
    val docs = Seq((1L, "QUICK BROWN FOX"), (2L, "ZEBRA XYLOPHONE"),
      (3L, "")).toDF("doc_id", "text")
    val trained = ByteBpe.tokenCounts(docs, "doc_id", "text",
      graft.queries.LlmQueries.l126Merges).as[(Long, Long)].collect().toMap
    val empty = ByteBpe.tokenCounts(docs, "doc_id", "text", Seq.empty)
      .as[(Long, Long)].collect().toMap
    assert(trained == empty)
    assert(trained(1L) == "QUICK BROWN FOX".getBytes("UTF-8").length.toLong)
    assert(trained(3L) == 0L)
  }

  test("string-replace unroll: pair-wrapped separators fix the prefix hazard (l139)") {
    // the DuckDB oracle's Scala mirror — java String.replace is the
    // same all-occurrences left-to-right non-overlapping semantics
    def unrollPairWrap(units: String, merges: Seq[(String, String)]): Seq[String] = {
      var s = units.map(u => "" + u + "").mkString
      merges.foreach { case (a, b) =>
        s = s.replace("" + a + "" + b + "",
          "" + a + b + "")
      }
      s.split('').filter(_.nonEmpty).toSeq
    }
    def unrollOneSided(units: String, merges: Seq[(String, String)]): Seq[String] = {
      var s = units.map(u => "" + u).mkString
      merges.foreach { case (a, b) =>
        s = s.replace("" + a + "" + b, "" + a + b)
      }
      s.split('').filter(_.nonEmpty).toSeq
    }
    // the corpus-trained hazard shape: (l,u) learned before (a,l), and
    // a token where "lu" has already formed when rank (a,l) arrives —
    // the one-sided pattern \x01a\x01l then matches the PREFIX of "lu"
    val merges = Seq(("l", "u"), ("a", "l"))
    val loop = Bpe.encodeWord("value", merges.zipWithIndex.toMap)
    assert(loop == Seq("v", "a", "lu", "e"))
    assert(unrollPairWrap("value", merges) == loop)
    assert(unrollOneSided("value", merges) == Seq("v", "alu", "e"),
      "the hazard this test documents — if this stops reproducing, the" +
        " mirror no longer matches DuckDB replace semantics")
    // consecutive same-pair matches still chain under the pair-wrap
    assert(unrollPairWrap("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    assert(unrollPairWrap("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    // fuzz the pair-wrap against the encode loop on l126's table
    val table = graft.queries.LlmQueries.l126Merges
    val rank = table.zipWithIndex.toMap
    val rnd = new scala.util.Random(139L)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    (0 until 2000).foreach { i =>
      val tok = (if (rnd.nextBoolean()) "Ġ" else "") +
        (0 until (1 + rnd.nextInt(12))).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(unrollPairWrap(tok, table) == Bpe.encodeWord(tok, rank), s"case $i '$tok'")
    }
  }

  test("corpus-trained table (l139): distributed ≡ local, preconditions hold") {
    // a corpus engineered to learn prefix-hazard merge shapes: words
    // share stems so pairs like (l,u) and (a,l) both train
    val stems = Seq("value", "valor", "glue", "alumni", "lunar", "altar",
      "blue", "plural", "salute", "aloud", "flux", "evaluate")
    val docs = (0 until 150).map { i =>
      (i.toLong, (0 until 8).map(k => stems((i * 7 + k * 3) % stems.length))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val distributed = ByteBpe.trainMerges(docs, "text", nMerges = 24, minCount = 2L)
    // local twin: same pre-tokenizer, same driver endgame, no Spark agg
    val p = java.util.regex.Pattern.compile(ByteBpe.PreTokenPattern)
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    docs.as[(Long, String)].collect().foreach { case (_, t) =>
      val m = p.matcher(t)
      while (m.find()) counts.update(m.group, counts.getOrElse(m.group, 0L) + 1L)
    }
    val pruned = counts.toSeq.filter(_._2 >= 2L)
    val local = Bpe.trainMergesLocal(
      pruned.map { case (t, c) => (ByteBpe.toByteUnits(t).map(_.toString).toArray, c) },
      24)
    assert(distributed == local, "corpus-trained distributed ≡ local")
    val ms = distributed.map(m => (m._1, m._2))
    graft.queries.LlmQueries.assertByteBpePreconditions(ms, "spec")
  }

  test("minCount prunes hapax pre-tokens from training but never from encode") {
    val docs = Seq((1L, "sun sun sun zq")).toDF("doc_id", "text")
    val merges = ByteBpe.trainMerges(docs, "text", nMerges = 5, minCount = 2L)
    assert(merges.nonEmpty)
    assert(!merges.exists(m => (m._1 + m._2).exists(c => c == 'z' || c == 'q')))
    val enc = ByteBpe.encodeTokensFast(docs, "text", merges.map(m => (m._1, m._2)))
      .where(col("units") === ByteBpe.toByteUnits(" zq")).collect()
    assert(enc.length == 1 && enc(0).getLong(2) == 3L) // Ġ|z|q — bytes, never [UNK]
  }
}
