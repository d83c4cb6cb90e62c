package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/**
 * Randomized model check for the as-of join: the single-shuffle
 * union+last-carry implementation must agree with a brute-force
 * driver-side model (for each left row: the right row with max
 * (ts, id) among those with ts <= left.ts in the same key) on seeded
 * random inputs with duplicate timestamps and boundary-equal times.
 */
class AsOfJoinPropSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lastValueAsOf matches the brute-force model on random inputs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { round =>
      val base = 1700000000000L
      def randRows(n: Int, idOffset: Long) = (0 until n).map { i =>
        // coarse time grid → guaranteed duplicate and boundary-equal ts
        (rnd.nextInt(4).toLong, new Timestamp(base + rnd.nextInt(20) * 60000L), idOffset + i)
      }
      val left = randRows(60, 1000)
      val right = randRows(40, 2000)

      val expected = left.flatMap { case (k, ts, id) =>
        val candidates = right.filter(r => r._1 == k && !r._2.after(ts))
        if (candidates.isEmpty) None
        else {
          val best = candidates.maxBy(r => (r._2.getTime, r._3))
          Some((id, best._3))
        }
      }.toSet

      val got = AsOfJoin.lastValueAsOf(
          left.toDF("user_id", "ts", "event_id"),
          right.toDF("user_id", "ts", "event_id"),
          "user_id", "ts", "event_id")
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet

      assert(got == expected, s"round $round: diff=${(got diff expected) ++ (expected diff got)}")
    }
  }
}
