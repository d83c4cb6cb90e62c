package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.sources.Tables

/**
 * Streaming/batch duality over a REAL file source (SURVEY.md §7.4): the
 * events parquet read via `readStream` + `Trigger.AvailableNow` must
 * produce exactly the batch results for stateless pipelines (filter/map
 * emit per micro-batch with no watermark dependency).
 */
class FileStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming file source: filter+map parity with the batch path") {
    import spark.implicits._
    val streamed = Tables.eventsStream(spark, sf)
      .filter(col("value") > 50.0)
      .select(col("event_id"), upper(col("event_type")).as("et"))
    val query = streamed.writeStream
      .format("memory").queryName("fs_t2")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    val got = spark.table("fs_t2").as[(Long, String)].collect().toSet
    val expected = Tables.events(spark, sf)
      .filter(col("value") > 50.0)
      .select(col("event_id"), upper(col("event_type")).as("et"))
      .as[(Long, String)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
