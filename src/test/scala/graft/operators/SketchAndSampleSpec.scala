package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Approximate aggregates (HLL / count-min / percentile sketches — Spark
  * built-ins, mergeable partial state) validated against their exact
  * counterparts, plus the deterministic samplers. The sketches are not
  * oracle-able across engines (different algorithms), so their guarantee
  * is an error bound vs. the exact answer. */
class SketchAndSampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact; approx_percentile sane") {
    val e = Tables.events(spark, sf)
    val (exact, approx) = e.agg(
      countDistinct(col("user_id")),
      approx_count_distinct(col("user_id"), rsd = 0.02))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"exact=$exact approx=$approx")

    val Array(p50, p99) = e.select(
      percentile_approx(col("value"), array(lit(0.5), lit(0.99)), lit(10000)))
      .head().getSeq[Double](0).toArray
    assert(p50 > 0 && p50 < p99)
  }

  test("flagged approx_percentile twin tracks exact l24/l39 within bound at sf0.01") {
    // the 100 TB swap SCALE.md promises: spark.graft.percentile.approx
    // reroutes l24/l39's percentile aggregates onto the GK sketch. Not
    // oracle-able across engines, so the guarantee pinned here is an
    // error bound vs the exact declared-query output.
    val sf01 = "/root/testdata/sf0.01"
    val key = "spark.graft.percentile.approx"
    def l24() = graft.SparkEntry.queries("l24_length_quantiles")(spark, sf01)
      .select("lang", "p25", "p50", "p75").as[(String, Double, Double, Double)]
      .collect().map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    def l39Buckets() = graft.SparkEntry.queries("l39_ppl_buckets")(spark, sf01)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val exact24 = l24()
    val exact39 = l39Buckets()
    spark.conf.set(key, "true")
    try {
      val approx24 = l24()
      assert(approx24.keySet == exact24.keySet)
      for (lang <- exact24.keySet; (e, a) <- exact24(lang).zip(approx24(lang)))
        assert(math.abs(a - e) / e <= 0.02,
          s"$lang: approx $a vs exact $e exceeds 2% relative error")
      val approx39 = l39Buckets()
      assert(approx39.keySet == exact39.keySet)
      // bucket flips happen only for docs at the cutoffs; the sketch at
      // accuracy 10000 must agree on at least 98% of documents
      val agree = exact39.count { case (id, b) => approx39(id) == b }
      assert(agree.toDouble / exact39.size >= 0.98,
        s"bucket agreement ${agree.toDouble / exact39.size}")
    } finally spark.conf.unset(key)
  }

  test("dupRateEstimate tracks the exact duplicate rate within sketch error") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // plant exact duplicates: every doc twice plus the originals once
    val doubled = docs.union(docs)
    val (rate, n) = Dedup.dupRateEstimate(doubled, "text")
    assert(n == 2 * docs.count())
    // exact rate is 0.5 (testdata has no exact dups); HLL rsd 2%
    assert(math.abs(rate - 0.5) < 0.03, s"estimated $rate")
    val (cleanRate, _) = Dedup.dupRateEstimate(docs, "text")
    assert(cleanRate < 0.03, s"estimated $cleanRate on a dup-free corpus")
  }

  test("stratifiedSample keeps exactly n per stratum, deterministically") {
    val docs = Tables.documents(spark, sf)
    val s1 = Sampling.stratifiedSample(docs, "lang", "doc_id", 3)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    val s2 = Sampling.stratifiedSample(docs, "lang", "doc_id", 3)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(s1 == s2) // reproducible
    val perLang = s1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perLang.values.forall(_ <= 3))
  }

  test("weightedPrioritySample: reference-exact, weight-monotone, size-capped") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val got = Sampling.weightedPrioritySample(docs, "lang", "doc_id", "n_chars", 15)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    // reference: the plain single-window form of the same priority rule
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") + 1
    val ref = docs.withColumn("__u", u)
      .withColumn("__q", expr("__u DIV n_chars"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("__q"), col("doc_id"))))
      .filter(col("rk") <= 15)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == ref)
    assert(got.groupBy(_._1).forall(_._2.size == 15)) // every lang has >15 docs
    // a stratum smaller than k survives whole
    val tiny = Seq(("a", 1L, 10L), ("a", 2L, 10L)).toDF("lang", "doc_id", "n_chars")
    assert(Sampling.weightedPrioritySample(tiny, "lang", "doc_id", "n_chars", 5)
      .count() == 2)
    // weight-monotone: a row weighted 10^6 against 99 weight-1 rivals wins
    // the k=1 slot (its priority quotient shrinks a million-fold; the
    // expected winner is computed with BigInt from the same md5 rule)
    val skewed = (1L to 100L).map(i => ("s", i, if (i == 42L) 1000000L else 1L))
      .toDF("lang", "doc_id", "n_chars")
    val winner = Sampling
      .weightedPrioritySample(skewed, "lang", "doc_id", "n_chars", 1)
      .select("doc_id").as[Long].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    def uOf(id: Long): BigInt = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16) + 1
    }
    val expWinner = (1L to 100L)
      .minBy(i => (uOf(i) / BigInt(if (i == 42L) 1000000L else 1L), i))
    assert(winner == expWinner)
    assert(expWinner == 42L) // and the heavy row does in fact win here
  }

  test("weightedPrioritySample model check: random weights vs a BigInt driver model") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def uOf(id: Long): BigInt = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16) + 1
    }
    for (seed <- Seq(11, 12)) {
      val rng = new scala.util.Random(seed)
      // weights span 1 .. ~1e9 — six orders of magnitude, far beyond any
      // length/score ratio a corpus produces
      val rows = (1L to 250L).map(i =>
        (s"s${rng.nextInt(3)}", i, math.max(1L, math.abs(rng.nextLong()) % 1000000000L)))
      val k = 1 + rng.nextInt(8)
      val got = Sampling.weightedPrioritySample(
          rows.toDF("lang", "doc_id", "w"), "lang", "doc_id", "w", k)
        .select("lang", "doc_id").as[(String, Long)].collect().toSet
      val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy { case (_, id, w) => (uOf(id) / BigInt(w), id) }
          .take(k).map(r => (g, r._2))
      }.toSet
      assert(got == exp, s"seed=$seed k=$k")
    }
  }

  test("tokenBudgetMix hits per-stratum token targets, caps at keep-all, drops unweighted strata") {
    // three strata with known token masses: "big" ~5000 tokens, "mid"
    // ~1000, "tiny" ~40 — budget 2000 at weights 50/40/10% targets
    // big 1000 (rate ~0.2), mid 800 (rate ~0.8), tiny 200 > mass 40
    // (rate caps at 1: keep everything, under-fill honestly)
    val docs = (
      (1 to 500).map(i => (i.toLong, "big", ("w " * 10).trim)) ++
      (1 to 100).map(i => (1000L + i, "mid", ("w " * 10).trim)) ++
      (1 to 4).map(i => (2000L + i, "tiny", ("w " * 10).trim)) ++
      (1 to 50).map(i => (3000L + i, "unweighted", ("w " * 10).trim))
    ).toDF("doc_id", "lang", "text")
      .withColumn("tok", graft.functions.TextFunctions.wsTokenCount(col("text")))
    val kept = Sampling.tokenBudgetMix(docs, "lang", "doc_id", "tok",
      Map("big" -> 500000L, "mid" -> 400000L, "tiny" -> 100000L), budgetTokens = 2000L)
    val toks = kept.groupBy("lang").agg(org.apache.spark.sql.functions.sum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets: big 1000, mid 800 — hash-draw tolerance ~25% on these sizes
    assert(math.abs(toks("big") - 1000.0) / 1000.0 < 0.25, toks.toString)
    assert(math.abs(toks("mid") - 800.0) / 800.0 < 0.25, toks.toString)
    assert(toks("tiny") == 40L, toks.toString)          // capped: keeps ALL its mass
    assert(!toks.contains("unweighted"))                // weight 0 -> dropped
    // bit-reproducible: the same call keeps the same rows
    assert(Sampling.tokenBudgetMix(docs, "lang", "doc_id", "tok",
        Map("big" -> 500000L, "mid" -> 400000L, "tiny" -> 100000L), 2000L)
      .select("doc_id").as[Long].collect().toSet ==
      kept.select("doc_id").as[Long].collect().toSet)
    // exact threshold semantics: replay the md5 rule driver-side
    val expectBig = (1 to 500).map(_.toLong).filter { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString
      // thr = 65536*500000*2000 div (1000000*5000) = 13107
      h < f"${13107}%04x"
    }.toSet
    assert(kept.filter(col("lang") === "big").select("doc_id").as[Long].collect().toSet
      == expectBig)
  }

  test("temperatureMix up-weights small strata and honors the overall target") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val kept = Sampling.temperatureMix(docs, "lang", "doc_id")
    val total = docs.count().toDouble
    val keptN = kept.count().toDouble
    // overall target 3/10, hash-sampling tolerance on ~500 docs
    assert(math.abs(keptN / total - 0.3) < 0.06, s"kept ${keptN / total}")
    // the temperature property: the smallest stratum keeps a strictly
    // larger FRACTION of itself than the largest (rate ∝ n^-0.5)
    val bySize = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._2)
    val (small, large) = (bySize.head._1, bySize.last._1)
    val keptBy = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fSmall = keptBy(small).toDouble / bySize.head._2
    val fLarge = keptBy(large).toDouble / bySize.last._2
    assert(fSmall > fLarge, s"$small kept $fSmall <= $large kept $fLarge")
    // deterministic: same call, same rows
    assert(Sampling.temperatureMix(docs, "lang", "doc_id")
      .select("doc_id").as[Long].collect().toSet ==
      kept.select("doc_id").as[Long].collect().toSet)
  }

  test("temperatureThresholds stays exact past the BIGINT product cliff (DECIMAL(38,0))") {
    // synthetic counts far beyond any corpus a test can materialize —
    // exact squares, so round(sqrt(n)·1000) is one unambiguous integer
    val counts = Seq(("big", 4000000000000000000L), ("mid", 9000000000000L),
      ("small", 1000000L))
    val got = Sampling.temperatureThresholds(counts.toDF("lang", "__n"), "lang", 3L, 10L)
      .as[(String, Long)].collect().toMap
    // independent reference: the same arithmetic in BigInt
    val w = counts.map { case (k, n) => k -> BigDecimal(math.sqrt(n.toDouble) * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt }.toMap
    val nn = counts.map(c => BigInt(c._2)).sum
    val sw = w.values.sum
    val expected = counts.map { case (k, n) =>
      k -> (BigInt(65536) * 3 * nn * w(k) / (BigInt(10) * n * sw)).min(BigInt(65536)).toLong
    }.toMap
    assert(got == expected)
    assert(expected("small") == 65536L && expected("big") < 65536L)
    // the big stratum's numerator alone exceeds Long.MaxValue — the old
    // BIGINT form wrapped negative exactly here
    assert(BigInt(65536) * 3 * nn * w("big") > BigInt(Long.MaxValue))
  }

  test("leakageSafeSplit: no near-dup cluster straddles the split; ratio near 9:1") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val clusters = Dedup.duplicateClusters(docs, "text", "doc_id")
      .select(col("id").as("doc_id"), col("cluster"))
    val split = Sampling.leakageSafeSplit(
      docs.select(col("doc_id")).join(clusters.hint("shuffle_hash"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("rep")),
      "rep")
    // the leakage guarantee: every group is single-split
    val mixed = split.groupBy("rep")
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(mixed == 0L)
    // and specifically every near-dup PAIR lands together (the property
    // a per-row random split violates by construction)
    val bySplit = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall(p => bySplit(p._1) == bySplit(p._2)))
    // ratio within a loose band of the 9:1 target
    val frac = bySplit.values.count(_ == "train").toDouble / bySplit.size
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac")
  }

  test("hashSample rate is approximately honored and deterministic") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val a = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size.toDouble / n - 0.2) < 0.08, s"kept ${a.size}/$n")
  }

  test("rateStratifiedSample: rates rounding to 16^4 keep the whole stratum") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    // 0.99999 * 65536 rounds to 65536 — the old %04x formatting produced
    // the 5-char "10000" and the lexicographic compare silently kept only
    // hashes starting with '0' (~6%). Must behave as rate 1.0.
    val kept = Sampling.rateStratifiedSample(docs, "lang", "doc_id",
      rates = Map.empty, defaultRate = 0.99999).count()
    assert(kept == n, s"kept $kept of $n at rate 0.99999")
    // and a genuinely fractional rate still samples that stratum only
    val langs = docs.select("lang").distinct().as[String].collect()
    val half = Sampling.rateStratifiedSample(docs, "lang", "doc_id",
      rates = Map(langs.head -> 0.5))
    val keptHead = half.filter(col("lang") === langs.head).count().toDouble
    val origHead = docs.filter(col("lang") === langs.head).count().toDouble
    assert(math.abs(keptHead / origHead - 0.5) < 0.25)
    assert(half.filter(col("lang") =!= langs.head).count() ==
      docs.filter(col("lang") =!= langs.head).count())
  }

  test("percentileGate: exact per-stratum cutoff, id tie-break, chunked rank ≡ plain row_number") {
    val rows = (0L until 200L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      (i, lang, (i * 37 % 100) + (if (lang == "en") 0L else 50L))
    }
    val df = rows.toDF("doc_id", "lang", "score")
    val out = Sampling.percentileGate(df, "lang", "score", "doc_id",
        dropBelowPpm = 250000L, idChunk = 16L)
      .select("doc_id", "lang", "score", "score_rank", "kept")
      .as[(Long, String, Long, Long, Boolean)].collect()
    // reference: plain per-stratum sort
    val ref = rows.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._1))
      val cut = sorted.size * 250000L / 1000000L
      sorted.zipWithIndex.map { case (r, i) => r._1 -> ((i + 1).toLong, i + 1 > cut) }
    }
    out.foreach { case (id, _, _, rk, kept) =>
      assert((rk, kept) == ref(id), s"doc $id: got ($rk,$kept) want ${ref(id)}")
    }
    // exactly 25% dropped per stratum (200/3→67; floor arithmetic)
    val dropped = out.filterNot(_._5).groupBy(_._2).view.mapValues(_.size).toMap
    assert(dropped("en") == 67 * 250000 / 1000000)
    assert(dropped("de") == 133 * 250000 / 1000000)
  }

  test("percentileGate ranks under TOTAL score ties stay bucket-bounded and id-ordered") {
    val df = (0L until 100L).map(i => (i, "en", 42L)).toDF("doc_id", "lang", "score")
    val out = Sampling.percentileGate(df, "lang", "score", "doc_id",
        dropBelowPpm = 100000L, idChunk = 8L)
      .select("doc_id", "score_rank").as[(Long, Long)].collect().toMap
    (0L until 100L).foreach(i => assert(out(i) == i + 1))
    // the plan's data-sized windows are all (lang, __bkt)-partitioned
    val plan = Sampling.percentileGate(df, "lang", "score", "doc_id", 100000L, idChunk = 8L)
      .queryExecution.executedPlan.toString
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .map(_.trim.replaceAll("^[:+\\- ]+", "")).toSeq.distinct
    assert(windows.nonEmpty)
    assert(windows.count(!_.contains("__bkt")) == 0, windows.mkString("\n"))
  }

  test("EventMonoidAggregator sums with max-timestamp propagation (typed path)") {
    import graft.api.{Event, EventMonoidAggregator}
    import java.sql.Timestamp
    val evs = Seq(
      Event.at(5L, Timestamp.valueOf("2024-01-01 10:00:00")),
      Event.at(7L, Timestamp.valueOf("2024-01-01 11:00:00")),
      Event.at(1L, Timestamp.valueOf("2024-01-01 09:00:00")))
    val out = spark.createDataset(evs).select(EventMonoidAggregator.sumLong).head()
    assert(out.value == 13L)
    assert(out.eventTime.contains(Timestamp.valueOf("2024-01-01 11:00:00")))
    assert(out.processingTime == Timestamp.valueOf("2024-01-01 11:00:00"))
  }
}
