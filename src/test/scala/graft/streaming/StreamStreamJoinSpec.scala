package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/**
 * Stream-stream inner join with watermark-bounded state — a capability
 * entirely absent from the reference (no joins at all, no two-stream
 * combination; SURVEY.md §2.2). Each side carries a watermark and the
 * time-range condition bounds how long a row waits for matches, so join
 * state is evictable — the only shape that survives unbounded streams.
 */
class StreamStreamJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clicks join purchases within 10 minutes, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)

    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]

    val c = clicks.toDF().toDF("user_id", "c_ts", "click_id")
      .withWatermark("c_ts", "0 seconds")
    val p = purchases.toDF().toDF("p_user_id", "p_ts", "purchase_id")
      .withWatermark("p_ts", "0 seconds")

    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
      .select("click_id", "purchase_id")

    val query = joined.writeStream
      .format("memory").queryName("ssj").outputMode("append").start()
    try {
      clicks.addData((1L, t("2024-03-01 10:00:00"), 100L))
      purchases.addData((1L, t("2024-03-01 10:05:00"), 900L)) // within window
      query.processAllAvailable()
      clicks.addData((1L, t("2024-03-01 12:00:00"), 101L))
      purchases.addData((1L, t("2024-03-01 12:30:00"), 901L)) // outside 10 min
      query.processAllAvailable()

      val got = spark.table("ssj").as[(Long, Long)].collect().toSet
      assert(got == Set((100L, 900L)), s"got $got")
    } finally query.stop()
  }
}
