package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

/** Streaming windowed distinct (dedup-within-watermark → windowed
  * count) vs the batch countDistinct twin: row-identical at close,
  * duplicates collapsing across micro-batches. */
class DistinctStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(hour: Long, min: Long): Timestamp =
    new Timestamp((hour * 3600 + min * 60) * 1000L)

  test("streaming emissions == batch countDistinct per window") {
    implicit val sqlCtx = spark.sqlContext
    // hour 10: users a,b,c with heavy duplication SPLIT ACROSS batches
    // (cross-batch dedup must hold); hour 11: a,d
    val batch1 = Seq((t(10, 1), "a"), (t(10, 2), "b"), (t(10, 3), "a"))
    val batch2 = Seq((t(10, 4), "a"), (t(10, 5), "c"), (t(10, 6), "b"),
      (t(11, 1), "a"), (t(11, 2), "d"), (t(11, 3), "d"))
    val all = batch1 ++ batch2
    val expected = DistinctStream.batch(
        all.toDF("ts", "user"), "ts", "user", 3600L)
      .as[(Long, Long)].collect().toSet

    val input = MemoryStream[(Timestamp, String)]
    val out = DistinctStream.stream(
      input.toDF().toDF("ts", "user").withWatermark("ts", "0 seconds"),
      "ts", "user", 3600L)
    val query = out.writeStream.format("memory").queryName("wdist")
      .outputMode("append").start()
    try {
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      input.addData(Seq((t(20, 0), "zz"))); query.processAllAvailable()
      input.addData(Seq((t(21, 0), "z2"))); query.processAllAvailable()
      val got = spark.table("wdist").as[(Long, Long)].collect().toSet
        .filterNot(_._1 >= 20L * 3600000000L)
      assert(got == expected, s"missing ${expected -- got}, extra ${got -- expected}")
      // hour 10 must count 3 (a,b,c once each despite 6 arrivals)
      assert(got.contains((10L * 3600000000L, 3L)))
      assert(got.contains((11L * 3600000000L, 2L)))
    } finally query.stop()
  }
}
