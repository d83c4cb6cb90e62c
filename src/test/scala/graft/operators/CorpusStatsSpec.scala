package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.TextFunctions

/** Hand-computed cases for the corpus-composition analytics plus the
  * PII-redaction column functions they certify in l51. */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ngramNovelty counts first-seen distinct n-grams per doc and accumulates") {
    // doc 1: grams {a b c, b c d} — both novel (2)
    // doc 2: grams {b c d, c d e} — b c d seen, c d e novel (1)
    // doc 3: "a b c d" → {a b c, b c d} — all seen (0)
    // doc 4: too short for 3-grams (0)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "b c d e"),
      (3L, "a b c d"),
      (4L, "x y")
    ).toDF("doc_id", "text")
    val out = CorpusStats.ngramNovelty(docs, "text", "doc_id", 3, bucketWidth = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_novel", "cum_novel")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L), (2L, 1L, 3L), (3L, 0L, 3L), (4L, 0L, 3L)))
  }

  test("ngramNovelty total equals the corpus-wide distinct gram count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = CorpusStats.ngramNovelty(docs, "text", "doc_id", 3)
    val total = out.agg(sum("n_novel")).as[Long].head()
    val distinctGrams = docs
      .select(explode(TextFunctions.wordShingles(col("text"), 3)).as("g"))
      .distinct().count()
    assert(total == distinctGrams)
    // the curve is the running sum of its own increments
    val last = out.orderBy(col("doc_id").desc).select("cum_novel").as[Long].head()
    assert(last == total)
  }

  test("sourceOverlap emits shared and union distinct-gram counts per pair") {
    // srcA grams: {a b c, b c d} ; srcB grams: {b c d, c d e} ; srcC: {q r s}
    val docs = Seq(
      (1L, "A", "a b c d"),
      (2L, "B", "b c d e"),
      (3L, "C", "q r s"),
      (4L, "A", "a b c") // duplicate gram within source — must not double-count
    ).toDF("doc_id", "src", "text")
    val out = CorpusStats.sourceOverlap(docs, "text", "src", 3)
      .select("src_a", "src_b", "n_shared", "n_union")
      .as[(String, String, Long, Long)].collect().toSet
    // only A∩B is non-empty: shared {b c d} = 1, union {a b c, b c d, c d e} = 3
    assert(out == Set(("A", "B", 1L, 3L)))
  }

  test("sourceDivergence: identical distributions give KL = 0, disjoint give ln(N/Ns)") {
    // A and B have the SAME distribution → every term ln(1) = 0.
    val same = Seq((1L, "A", "x y x"), (2L, "B", "x x y")).toDF("id", "src", "text")
    val klSame = CorpusStats.sourceDivergence(same, "text", "src")
      .select("src", "kl_vs_corpus").as[(String, Double)].collect().toMap
    assert(klSame("A") == 0.0 && klSame("B") == 0.0)

    // Disjoint vocabularies: every token satisfies n_st = n_t, so each
    // term is ln(N/Ns) and KL = ln(N/Ns) exactly.
    val disj = Seq((1L, "A", "a a b"), (2L, "B", "c d e c d e")).toDF("id", "src", "text")
    val out = CorpusStats.sourceDivergence(disj, "text", "src")
      .select("src", "n_tokens", "kl_vs_corpus")
      .as[(String, Long, Double)].collect()
      .map { case (s, n, k) => s -> ((n, k)) }.toMap
    def exp9then6(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expA = exp9then6(math.log(9.0 / 3.0))
    val expB = exp9then6(math.log(9.0 / 6.0))
    assert(out("A") == ((3L, expA)) && out("B") == ((6L, expB)))
  }

  test("hllShardSketches persist, re-merge in stages, and estimate within 5%") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = docs.select("text").distinct().count().toDouble

    // sketch per source, PERSIST the sketch bytes, merge from disk —
    // the cross-job pattern (no rescan of the base data at merge time)
    val dir = java.nio.file.Files.createTempDirectory("hll").toString + "/sk"
    CorpusStats.hllShardSketches(docs, "text", "source").write.parquet(dir)
    val persisted = spark.read.parquet(dir)
    val est = CorpusStats.hllMergeEstimate(persisted).as[Long].head().toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")

    // staged merge (merge halves, then merge the merged) must agree with
    // the flat merge — the re-mergeability the quarterly-rollup relies
    // on. Not bit-identical (the union gadget can hold a different HLL
    // register width than a leaf sketch), so pin close agreement plus
    // the same 5% bound vs exact.
    val halves = persisted.withColumn("half", (crc32(col("shard")) % 2).cast("int"))
    val partials = halves.groupBy("half")
      .agg(expr("hll_union_agg(sketch)").as("sketch"))
    val est2 = CorpusStats.hllMergeEstimate(partials).as[Long].head().toDouble
    assert(math.abs(est2 - est) / est < 0.02, s"staged=$est2 flat=$est")
    assert(math.abs(est2 - exact) / exact < 0.05, s"staged=$est2 exact=$exact")
  }

  test("keepBestPerCluster keeps the highest-priority member of each cluster") {
    // docs 1/2/3 are near-dups of each other (1 and 3 exact, 2 differs by
    // one word); doc 4 is unrelated and must pass through untouched.
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, base, 10L),
      (2L, base + " extra", 11L), // longest — must win its cluster
      (3L, base, 10L),
      (4L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", 10L)
    ).toDF("doc_id", "text", "n_chars")
    val kept = Dedup.keepBestPerCluster(docs, "text", "doc_id", col("n_chars"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L))
  }

  test("editDistancePairs: unit distance for a one-word substitution; banded variant caps") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("w5", "x5")), // 1 substituted char at distance 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    ).toDF("doc_id", "text")
    val d = Dedup.editDistancePairs(docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(d == Set((1L, 2L, 1L)))
    val banded = Dedup.editDistancePairs(docs, "text", "doc_id", threshold = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == Set((1L, 2L, -1L))) // past the bound → -1, pair still listed
  }

  test("r20's closed-form correlation matches a driver-side double fold") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def corr(xs: Seq[(Double, Double)]): Double = {
      val n = xs.size.toDouble
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val expected = li.groupBy(_._1).map { case (f, rows) =>
      f -> corr(rows.map(r => (r._2, r._3)).toSeq)
    }
    val got = graft.SparkEntry.queries("r20_correlation")(spark, "/root/testdata/sf0.001")
      .select("flag", "corr_qty_price").as[(String, Double)].collect().toMap
    for ((f, e) <- expected)
      assert(math.abs(got(f) - e) < 1e-6, s"flag $f: got ${got(f)} expected $e")
  }

  test("rhpCandidatePairs maxBucketSize drops oversized buckets only") {
    // 6 identical vectors form one degenerate bucket in every table;
    // two other near-identical vectors form a small legit bucket.
    val dup = Array.fill(8)(1.0)
    val near = Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.9)
    val rows = (0L until 6L).map(i => (i, dup)) ++ Seq((10L, near), (11L, near))
    val embs = rows.toDF("vec_id", "embedding")
    val unbounded = Dedup.rhpCandidatePairs(embs, "embedding", "vec_id", 8)
      .count()
    val capped = Dedup.rhpCandidatePairs(embs, "embedding", "vec_id", 8,
        maxBucketSize = 4)
      .as[(Long, Long)].collect().toSet
    // the 6-copy group (15 pairs) is gone; the 2-member bucket survives.
    // (dup and near agree on every hyperplane sign here, so dup+near can
    // share buckets of 8 — capped at 4 both degenerate groups drop, but
    // the pair (10,11) can only survive via a bucket without the dups if
    // tables split them; assert the unambiguous facts instead:)
    assert(unbounded >= 15L)
    assert(!capped.exists { case (a, b) => a < 6L && b < 6L },
      s"capped pairs still contain the degenerate group: $capped")
  }

  test("redactPii replaces emails then phone-like runs; piiCount agrees") {
    val rows = Seq(
      (1L, "write bob.smith+x@mail-host.org today"),
      (2L, "call +1 (415) 555-0199 now"),
      (3L, "a@b.io and 1234567 both"),
      (4L, "no pii here at all")
    ).toDF("id", "t")
    val out = rows.select(col("id"),
        TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out(0)._2 == "write <EMAIL> today" && out(0)._3 == 1L)
    assert(out(1)._2 == "call <PHONE> now" && out(1)._3 == 1L)
    assert(out(2)._2 == "<EMAIL> and <PHONE> both" && out(2)._3 == 2L)
    assert(out(3)._2 == "no pii here at all" && out(3)._3 == 0L)
  }

  test("redactPii: ids, IPv4, and Luhn-gated cards; a failing checksum is not a card") {
    val rows = Seq(
      (1L, "ssn 123-45-6789 on file"),
      (2L, "from 192.168.1.254 at night"),
      (3L, "pay 4111 1111 1111 1111 visa"),       // Luhn-valid (spaced)
      (4L, "pay 5555555555554444 mc"),            // Luhn-valid (plain)
      (5L, "ref 4111 1111 1111 1112 code"),       // Luhn-FAILS → not a card
      (6L, "amex 378282246310005 ok"),            // 15-digit plain run, valid
      (7L, "order 1234567890123 num"))            // 13 digits, Luhn-fails
      .toDF("id", "t")
    val out = rows.select(col("id"),
        TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out(0)._2 == "ssn <ID> on file" && out(0)._3 == 1L)
    assert(out(1)._2 == "from <IP> at night" && out(1)._3 == 1L)
    assert(out(2)._2 == "pay <CC> visa" && out(2)._3 == 1L)
    assert(out(3)._2 == "pay <CC> mc" && out(3)._3 == 1L)
    // checksum failure: no <CC>; the digit run falls to the phone class
    assert(!out(4)._2.contains("<CC>"))
    assert(out(4)._2 == "ref <PHONE> code" && out(4)._3 == 1L)
    assert(out(5)._2 == "amex <CC> ok" && out(5)._3 == 1L)
    assert(!out(6)._2.contains("<CC>") && out(6)._2 == "order <PHONE> num")
  }

  test("redactPii: card replace is boundary-anchored — digits inside a longer run untouched") {
    // the 18-digit run CONTAINS the valid card's digits but is itself
    // Luhn-failing; a bare literal replace would mangle it to 8<CC>9
    val row = Seq((1L, "pay 5555555555554444 raw 855555555555544449 end"))
      .toDF("id", "t")
      .select(TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
      .as[(String, Long)].head()
    assert(row._1 == "pay <CC> raw <PHONE> end", row._1)
    assert(row._2 == 2L)
  }

  test("withPiiColumns staged form matches the scalar forms row-for-row") {
    val rows = Seq(
      (1L, "mail a@b.io call +1 (415) 555-0199 ssn 123-45-6789"),
      (2L, "pay 4111 1111 1111 1111 from 10.0.0.1"),
      (3L, "ref 4111 1111 1111 1112 raw 855555555555544449"),
      (4L, "clean text no pii at all"))
      .toDF("id", "t")
    val staged = TextFunctions.withPiiColumns(rows, "t")
      .select("id", "n_pii", "n_emails", "n_cards", "pii_redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val scalar = rows.select(col("id"),
        TextFunctions.piiCount(col("t")),
        org.apache.spark.sql.functions.regexp_count(col("t"),
          org.apache.spark.sql.functions.lit(TextFunctions.EmailPattern)).cast("long"),
        org.apache.spark.sql.functions.size(TextFunctions.ccSpans(col("t"))).cast("long"),
        TextFunctions.redactPii(col("t")))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(staged == scalar)
  }

  test("lineQualityFilter applies each C4 rule; blank structure lines survive") {
    val page = Seq(
      "This is a perfectly fine sentence with enough words.", // kept
      "Click here",                                           // < 5 words
      "",                                                     // blank — kept (structure)
      "Menu Home About Contact Privacy Terms",                // no terminal punct
      "Please enable javascript to continue reading this.",   // javascript
      "He asked where the old bridge crossed the river?",     // kept (?)
      "She shouted the answer across the crowded noisy room!", // kept (!)
      "The sign read \"closed for the winter season now.\"",  // kept (ends ")
      "Short tail.").mkString("\n")                           // < 5 words
    val out = Seq(Tuple1(page)).toDF("t")
      .select(TextFunctions.lineQualityFilter(col("t")).as("c"))
      .as[String].head()
    assert(out == Seq(
      "This is a perfectly fine sentence with enough words.",
      "",
      "He asked where the old bridge crossed the river?",
      "She shouted the answer across the crowded noisy room!",
      "The sign read \"closed for the winter season now.\"").mkString("\n"))
  }

  test("cascade fixture: the javascript interstitial survives boilerplate and dies ONLY to the C4 rule") {
    // non-vacuity pin for l68's line-quality stage: if jusText dropped
    // the trap block itself, wiring lineQualityFilter into the cascade
    // would be symmetric dead code on both engine sides
    val html = graft.sources.CascadeFixtures.htmlOf(24) // variant 2
    val blocks = Seq(Tuple1(html)).toDF("h")
      .select(TextFunctions.mainContentBlocks(col("h")).as("bs"))
      .select(explode(col("bs")).as("b"))
      .select(col("b.t").as("t"), col("b.keep").as("keep"))
      .as[(String, Boolean)].collect().toSeq
    val kept = blocks.filter(_._2).map(_._1)
    val trap = kept.filter(_.contains("javascript"))
    assert(trap.nonEmpty, s"trap block not kept by boilerplate: $blocks")
    // 13 words, terminal '.', link-free — only the javascript rule fires
    val afterC4 = Seq(Tuple1(kept.mkString("\n"))).toDF("t")
      .select(TextFunctions.lineQualityFilter(col("t")).as("c"))
      .as[String].head()
    assert(!afterC4.contains("javascript"))
    assert(afterC4.nonEmpty) // the prose block itself survives the rules
  }

  test("lineQualityFilter: minWords is tunable and an all-kept page is unchanged") {
    val page = "One two three keep this line.\nAnd another good line survives here."
    val out = Seq(Tuple1(page)).toDF("t")
      .select(TextFunctions.lineQualityFilter(col("t"), minWords = 3).as("c"))
      .as[String].head()
    assert(out == page)
  }

  test("normalizeText canonicalizes case, punctuation, and whitespace runs") {
    val rows = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "  HELLO ... world  "),
      (4L, "unrelated text"),
      (5L, "...!!!") // punctuation-only → empty
    ).toDF("id", "t")
    val out = rows.select(col("id"),
        TextFunctions.normalizeText(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "hello world")
    assert(out(2L) == "hello world")
    assert(out(3L) == "hello world") // all three share one dedup key
    assert(out(4L) == "unrelated text")
    assert(out(5L) == "")
  }
}
