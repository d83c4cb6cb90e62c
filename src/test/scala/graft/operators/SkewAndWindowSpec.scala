package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewAndWindowSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SkewJoin.saltedInnerJoin returns exactly the plain join's rows") {
    // skewed left: key 1 dominates
    val large = (1 to 500).map(i => (if (i <= 450) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "lv")
    val small = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "rv")
    val plain = large.join(small, "k").select("k", "lv", "rv")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", buckets = 8)
      .select("k", "lv", "rv").as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("Windows.tumbling counts per aligned hour; sliding covers size/slide windows") {
    val ts = Seq("2024-01-01 10:05:00", "2024-01-01 10:55:00", "2024-01-01 11:05:00")
      .map(java.sql.Timestamp.valueOf)
    val df = ts.map(t => (1L, t)).toDF("user_id", "ts")
    val tum = Windows.tumbling(df, "ts", "user_id", "1 hour", Seq(count(lit(1)).as("n")))
      .select("w_start", "n").as[(java.sql.Timestamp, Long)].collect().toMap
    assert(tum(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) == 2)
    assert(tum(java.sql.Timestamp.valueOf("2024-01-01 11:00:00")) == 1)

    val sli = Windows.sliding(df, "ts", "user_id", "1 hour", "30 minutes",
        Seq(count(lit(1)).as("n")))
      .select("w_start", "n").as[(java.sql.Timestamp, Long)].collect().toMap
    // event at 10:05 lands in windows starting 09:30 and 10:00
    assert(sli(java.sql.Timestamp.valueOf("2024-01-01 09:30:00")) == 1)
    assert(sli(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) == 2) // 10:05 + 10:55
    assert(sli(java.sql.Timestamp.valueOf("2024-01-01 10:30:00")) == 2) // 10:55 + 11:05
  }

  test("two-phase sliding count equals the direct window-generator form") {
    val rnd = new scala.util.Random(99)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(4).toLong, new java.sql.Timestamp(base + rnd.nextInt(36000) * 1000L))
    }
    val df = rows.toDF("user_id", "ts")
    val direct = Windows.sliding(df, "ts", "user_id", "1 hour", "30 minutes",
        Seq(count(lit(1)).as("n")))
      .select("user_id", "w_start", "n")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val twoPhase = Windows.slidingCountTwoPhase(df, "ts", "user_id", 3600L, 1800L)
      .select("user_id", "w_start", "n")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(twoPhase == direct)
    assert(direct.nonEmpty)
  }

  test("runningSumScalable equals the plain partitioned window on random input") {
    import org.apache.spark.sql.expressions.Window
    // random (group, ord, value) rows, unique ord per group; several
    // bucket widths including degenerate ones (1 = a bucket per id,
    // 1000 = one bucket per group → exactly the plain-window plan)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 500).map { i =>
      (s"g${rnd.nextInt(5)}", i.toLong, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("g", "ord", "v")
    val w = Window.partitionBy("g").orderBy("ord")
    val plain = df.withColumn("cum", sum(col("v")).over(w))
      .select("g", "ord", "cum").as[(String, Long, Long)].collect().toSet
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val scalable = Windows.runningSumScalable(df, Seq("g"),
          floor(col("ord") / width).cast("long"), Seq(col("ord")), col("v"), "cum")
        .select("g", "ord", "cum").as[(String, Long, Long)].collect().toSet
      assert(scalable == plain, s"width $width diverges")
    }
    // rank form: value = 1 reproduces row_number
    val rankPlain = df.withColumn("rk", row_number().over(w).cast("long"))
      .select("g", "ord", "rk").as[(String, Long, Long)].collect().toSet
    val rankScalable = Windows.runningSumScalable(df, Seq("g"),
        floor(col("ord") / 7).cast("long"), Seq(col("ord")), lit(1L), "rk")
      .select("g", "ord", "rk").as[(String, Long, Long)].collect().toSet
    assert(rankScalable == rankPlain)
  }

  test("assignShards with a small bucket width matches the single-window rule") {
    // the two-pass path with MANY live buckets must reproduce the
    // window-form shard assignment bit-for-bit (the l30 contract)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val wide = graft.sources.ShardWriter
      .assignShards(docs, "text", "doc_id", "source", 2000L) // default 2^20: one bucket
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val narrow = graft.sources.ShardWriter
      .assignShards(docs, "text", "doc_id", "source", 2000L, idBucketWidth = 8L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(narrow == wide)
  }

  test("topKPerKeyScalable equals the single-window top-k on random input") {
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(77)
    val rows = (1L to 500L).map(i =>
      (s"g${rng.nextInt(4)}", i, rng.nextInt(1000).toLong))
    val df = rows.toDF("g", "id", "score")
    val plain = df.withColumn("rk",
        row_number().over(Window.partitionBy("g")
          .orderBy(col("score").desc, col("id"))))
      .filter(col("rk") <= 7)
      .select("g", "id", "score", "rk").as[(String, Long, Long, Int)]
      .collect().toSet
    val scalable = Windows.topKPerKeyScalable(df, Seq("g"),
        Seq(col("score").desc, col("id")), 7,
        pmod(xxhash64(col("id")), lit(5)), "rk")
      .select("g", "id", "score", "rk").as[(String, Long, Long, Int)]
      .collect().toSet
    assert(scalable == plain)
    // groups smaller than k survive whole
    val tiny = Seq(("a", 1L, 5L), ("a", 2L, 3L), ("b", 3L, 9L))
      .toDF("g", "id", "score")
    assert(Windows.topKPerKeyScalable(tiny, Seq("g"),
      Seq(col("score").desc, col("id")), 7,
      pmod(xxhash64(col("id")), lit(5)), "rk").count() == 3)
  }

  test("topKPerKeyScalable model check: random shapes, duplicate scores, varying salts") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val n = 200 + rng.nextInt(300)
      val groups = 1 + rng.nextInt(6)
      val k = 1 + rng.nextInt(10)
      val salts = 1 + rng.nextInt(8)
      // scores drawn from a 5-value range: heavy ties, so the id
      // tiebreaker decides most ranks — the edge a salted split must
      // not scramble
      val df = (1L to n.toLong).map(i =>
        (s"g${rng.nextInt(groups)}", i, rng.nextInt(5).toLong))
        .toDF("g", "id", "score")
      val plain = df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
        .filter(col("rk") <= k)
        .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
      val scalable = Windows.topKPerKeyScalable(df, Seq("g"),
          Seq(col("score").desc, col("id")), k,
          pmod(xxhash64(col("id")), lit(salts)), "rk")
        .select("g", "id", "rk").as[(String, Long, Int)].collect().toSet
      assert(scalable == plain, s"seed=$seed n=$n groups=$groups k=$k salts=$salts")
    }
  }

  test("SkewJoin.keyStats: exact counts, integer shares, top-k order") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"cold$i")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val got = SkewJoin.keyStats(df, "k", 3)
      .as[(String, Long, Long, Long)].collect().toSeq
    // 100 rows, 12 distinct keys; hot = 60% = 600000 ppm, skew 60*12*1000/100
    assert(got.head == (("hot", 60L, 600000L, 7200L)))
    assert(got(1) == (("warm", 30L, 300000L, 3600L)))
    assert(got(2)._2 == 1L && got(2)._1 == "cold1") // tie broken by key
    assert(got.size == 3)
  }

  test("Source/Sink traits round-trip through Env.addSource / addSink") {
    import graft.api._
    val sink = Sink.collecting[Int]
    Env(spark).addSource(Source.ofValues(Seq(1, 2, 3)))
      .filter(_.value > 1)
      .addSink(sink)
    assert(sink.values.sorted == Seq(2, 3))
  }

  test("gapFillCumulative fills missing buckets with zeros and accumulates") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // user a: events in hours 10, 10, 13 → spine 10..13 with a 2-hour gap;
    // user b: single event → one-row spine
    val ev = Seq(
      ("a", 10L * 3600 + 5), ("a", 10L * 3600 + 600), ("a", 13L * 3600 + 1),
      ("b", 20L * 3600)
    ).toDF("u", "sec").select(col("u"), timestamp_seconds(col("sec")).as("ts"))
    val out = Windows.gapFillCumulative(ev, "u", "ts", 3600L, bucketsPerChunk = 2L)
      .orderBy("u", "bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 2L, 2L), ("a", 11L, 0L, 2L), ("a", 12L, 0L, 2L),
      ("a", 13L, 1L, 3L), ("b", 20L, 1L, 1L)))
    // bucketsPerChunk=2 exercises the chunked prefix-sum across a
    // chunk boundary (buckets 10-11 | 12-13); the window form must agree
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("bucket")
    val simple = Windows.gapFillCumulative(ev, "u", "ts", 3600L)
      .withColumn("__chk", org.apache.spark.sql.functions.sum("n_events").over(w))
      .filter(col("cum_events") =!= col("__chk")).count()
    assert(simple == 0L)
  }

  test("runningSumChunked equals runningSumScalable on random input across chunk widths") {
    import org.apache.spark.sql.functions.{col, expr, lit}
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map(_ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(200).toLong, rnd.nextInt(9).toLong + 1))
      .distinct // near-unique (g, ord); residual ties hit both forms'
                // identical RANGE-frame tie semantics, also under test
    val df = rows.toDF("g", "ord", "v")
    for (w <- Seq(1L, 7L, 64L)) {
      val a = Windows.runningSumScalable(df, Seq("g"), expr(s"ord div $w"),
          Seq(col("ord")), col("v"), "rs")
        .select("g", "ord", "rs").as[(String, Long, Long)].collect().toSet
      val b = Windows.runningSumChunked(df, Seq("g"), expr(s"ord div $w"),
          Seq(col("ord")), col("v"), "rs")
        .select("g", "ord", "rs").as[(String, Long, Long)].collect().toSet
      assert(a == b, s"chunk width $w")
    }
  }

  test("gapFillInterpolate equals the plain-window form on random sparse series") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    // sparse measurements: ~30 random (key, hour) points over a 200-hour
    // span per key, random values — gaps of every width incl. across
    // multiple chunk boundaries
    val rows = (for {
      k <- 0 until 4
      _ <- 0 until 30
    } yield (s"k$k", rnd.nextInt(200).toLong * 3600L,
      math.round(rnd.nextDouble() * 100 * 100) / 100.0)).distinct
    val ev = rows.toDF("k", "sec", "value")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val chunked = Windows.gapFillInterpolate(ev, "k", "ts", "value", 3600L,
        bucketsPerChunk = 5L)
      .select("k", "bucket", "measured", "v_fill")
      .as[(String, Long, Long, Double)].collect().toSet
    // reference: single per-key IGNORE NULLS windows (the oracle's form)
    val measured = ev.select(col("k"),
        expr("unix_timestamp(ts) div 3600").as("bucket"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("m"))
      .groupBy("k", "bucket")
      .agg((sum("m").cast("double") / count(lit(1)) / lit(1000000.0)).as("v"))
    val spine = measured.groupBy("k")
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(col("k"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val plain = spine.join(measured, Seq("k", "bucket"), "left")
      .withColumn("pv", last("v", ignoreNulls = true).over(wp))
      .withColumn("pb", last(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(wp))
      .withColumn("nv", first("v", ignoreNulls = true).over(wn))
      .withColumn("nb", first(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(wn))
      .select(col("k"), col("bucket"),
        when(col("v").isNotNull, 1L).otherwise(0L).as("measured"),
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("bucket") - col("pb")).cast("double") /
              (col("nb") - col("pb")).cast("double"))).as("v_fill"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(chunked == plain,
      s"missing ${plain -- chunked}, extra ${chunked -- plain}")
  }

  test("gapFillInterpolate draws the line between measured neighbors across chunk gaps") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // user a: hour 10 → 2.0, hour 14 → 10.0; gap hours 11-13 must read
    // 4, 6, 8. bucketsPerChunk=2 puts the gap across chunks 5|6|7, so
    // hours 12-13 (chunk 6, no measurement) exercise BOTH carry sides.
    val ev = Seq(
      ("a", 10L * 3600, 2.0), ("a", 14L * 3600, 10.0),
      // user b: two events in one bucket → measured mean 3.5, one-row spine
      ("b", 20L * 3600, 3.0), ("b", 20L * 3600 + 9, 4.0)
    ).toDF("u", "sec", "value")
      .select(col("u"), timestamp_seconds(col("sec")).as("ts"), col("value"))
    val out = Windows.gapFillInterpolate(ev, "u", "ts", "value", 3600L,
        bucketsPerChunk = 2L)
      .orderBy("u", "bucket")
      .as[(String, Long, Long, Double)].collect().toSeq
    val expected = Seq(
      ("a", 10L, 1L, 2.0), ("a", 11L, 0L, 4.0), ("a", 12L, 0L, 6.0),
      ("a", 13L, 0L, 8.0), ("a", 14L, 1L, 10.0), ("b", 20L, 1L, 3.5))
    assert(out.size == expected.size)
    out.zip(expected).foreach { case ((u, b, m, v), (eu, eb, em, ev0)) =>
      assert(u == eu && b == eb && m == em && math.abs(v - ev0) < 1e-9, s"$u/$b")
    }
  }
}
