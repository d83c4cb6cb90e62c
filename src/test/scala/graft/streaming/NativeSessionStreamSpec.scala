package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

/**
 * The RELATIONAL streaming path (SURVEY.md §3 entry 3): native
 * `session_window` aggregation under a watermark in append mode — the
 * same close-out rule the typed facade implements. This is the form the
 * declared queries use (graft.operators.Sessionize) running as a real
 * incremental query.
 */
class NativeSessionStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming session_window agg emits merged sessions on watermark pass") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val sessions = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("user_id"), col("session_window.start").as("s"), col("n"), col("sv"))

    val query = sessions.writeStream
      .format("memory").queryName("native_sess").outputMode("append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      // one session 12:00-12:05 for user 1
      input.addData((1L, t("2024-05-01 12:00:00"), 1.0), (1L, t("2024-05-01 12:05:00"), 2.0))
      query.processAllAvailable()
      assert(spark.table("native_sess").count() == 0) // watermark behind

      // advance watermark far past 12:05+10m
      input.addData((2L, t("2024-05-01 14:00:00"), 5.0))
      query.processAllAvailable()

      val fired = spark.table("native_sess")
        .as[(Long, Timestamp, Long, Double)].collect().toSet
      assert(fired.contains((1L, t("2024-05-01 12:00:00"), 2L, 3.0)), s"got $fired")
    } finally query.stop()
  }
}
