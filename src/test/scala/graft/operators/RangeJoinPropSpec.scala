package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Model check: the time-bucketed range join must equal the naive
  * equi-join + time-filter form on random input — second-resolution
  * times over a 2-hour span give plenty of exact-boundary pairs
  * (b_ts == a_ts + window), the edge the bucket math must not lose. */
class RangeJoinPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed range join equals the naive form on random input") {
    val rnd = new scala.util.Random(7)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(5).toLong, new Timestamp(base + rnd.nextInt(7200) * 1000L), i.toLong)
    }
    val df = rows.toDF("user_id", "ts", "event_id")
    val win = 300000000L // 5 minutes in µs

    val bucketed = RangeJoin.follows(df, df, "user_id", "ts", "event_id", win)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    val a = df.select(col("user_id"), col("ts").as("a_ts"), col("event_id").as("a_id"))
    val b = df.select(col("user_id"), col("ts").as("b_ts"), col("event_id").as("b_id"))
    val naive = a.join(b, Seq("user_id"))
      .filter(col("b_ts") > col("a_ts") &&
        unix_micros(col("b_ts")) <= unix_micros(col("a_ts")) + win)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet

    assert(naive.nonEmpty)
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).take(5)} extra=${(bucketed -- naive).take(5)}")
  }
}
