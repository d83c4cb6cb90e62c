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

  test("Source/Sink traits round-trip through Env.addSource / addSink") {
    import graft.api._
    val sink = Sink.collecting[Int]
    Env(spark).addSource(Source.ofValues(Seq(1, 2, 3)))
      .filter(_.value > 1)
      .addSink(sink)
    assert(sink.values.sorted == Seq(2, 3))
  }
}
