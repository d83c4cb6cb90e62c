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

  test("approxStream tracks the exact count within rsd, duplicates absorbed across batches") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(31)
    // two windows, ~1500/~800 distinct ids, heavy duplication split
    // across batches (the sketch must merge, not recount)
    def mk(hour: Long, ids: Int, rows: Int) =
      (1 to rows).map(_ => (t(hour, 1 + rnd.nextInt(50)), s"u$hour-${rnd.nextInt(ids)}"))
    // batch 1 carries ONLY window-10 rows: any later timestamp would
    // advance the watermark past 11:00 and close window 10 before
    // batch 2's half arrives (late-dropped, silently under-counting) —
    // the cross-batch SKETCH MERGE is exactly what this test pins
    val b1 = mk(10, 1500, 4000)
    val b2 = mk(10, 1500, 4000) ++ mk(11, 800, 4000)
    val all = b1 ++ b2
    val exact = DistinctStream.batch(all.toDF("ts", "user"), "ts", "user", 3600L)
      .as[(Long, Long)].collect().toMap

    val input = MemoryStream[(Timestamp, String)]
    val out = DistinctStream.approxStream(
      input.toDF().toDF("ts", "user").withWatermark("ts", "0 seconds"),
      "ts", "user", 3600L)
    val query = out.writeStream.format("memory").queryName("wdista")
      .outputMode("append").start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      input.addData(Seq((t(20, 0), "zz"))); query.processAllAvailable()
      input.addData(Seq((t(21, 0), "z2"))); query.processAllAvailable()
      val got = spark.table("wdista").as[(Long, Long)].collect().toMap
        .filterNot(_._1 >= 20L * 3600000000L)
      assert(got.keySet == exact.keySet, s"windows ${got.keySet} vs ${exact.keySet}")
      got.foreach { case (w, approx) =>
        val e = exact(w).toDouble
        // rsd 0.01 → 4σ = 4%; a generous bound that still catches a
        // recount (2× error) or a lost merge (half)
        assert(math.abs(approx - e) / e <= 0.04, s"window $w: approx $approx vs exact $e")
      }
    } finally query.stop()
  }
}
