package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/**
 * Scale probe for graft.streaming.StreamJoins (follows /
 * followsLeftOuter / followsFullOuter): the Scaladoc claims join state
 * is HORIZON-bounded — each side holds only rows younger than
 * horizon + watermark delay — so state should track the per-batch
 * ingest RATE, not history length (5 hourly batches deep, state stays
 * flat) and scale ~linearly when the rate grows 10×.
 *
 * Usage: `sbt "runMain graft.StreamJoinProbe <eventsPerBatchPerSide>"`
 * (run at e.g. 5000 and 50000 and compare state rows per batch; 500
 * users, 10 min horizon, 5 min watermark delay, 5 hourly file batches).
 */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val perBatch = args.headOption.map(_.toInt).getOrElse(5000)
    val users = 500
    val batches = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_sjprobe")
      .toFile.getAbsolutePath
    val rnd = new scala.util.Random(17)
    def gen(side: String): Unit =
      (0 until batches).foreach { b =>
        val rows = (0 until perBatch).map { i =>
          (b.toLong * perBatch + i, s"u${rnd.nextInt(users)}",
            new Timestamp(1704100000000L + b * 3600000L + rnd.nextInt(3600000)))
        }
        rows.toDF("id", "user_id", "ts").coalesce(1)
          .write.mode("append").parquet(s"$root/$side")
      }
    gen("views"); gen("clicks")

    def stream(side: String) = spark.readStream
      .schema("id BIGINT, user_id STRING, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$root/$side")
      .withWatermark("ts", "5 minutes")

    Seq(
      ("inner", () => graft.streaming.StreamJoins.follows(
        stream("views"), stream("clicks"), "user_id", "ts", "id", "10 minutes")),
      ("left", () => graft.streaming.StreamJoins.followsLeftOuter(
        stream("views"), stream("clicks"), "user_id", "ts", "id", "10 minutes")),
      ("full", () => graft.streaming.StreamJoins.followsFullOuter(
        stream("views"), stream("clicks"), "user_id", "ts", "id", "10 minutes"))
    ).foreach { case (mode, build) =>
      val t0 = System.nanoTime()
      val q = build().writeStream.format("noop")
        .option("checkpointLocation", s"$root/ckpt_$mode")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[probe] mode=$mode perSide=$perBatch users=$users " +
        f"horizon=10m wm=5m wall ${wall}%.1f s")
      println("[probe] batch | input | batch_ms | join state rows")
      q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
        val st = p.stateOperators.map(so => so.numRowsTotal).mkString(" ")
        println(f"[probe] ${p.batchId}%5d | ${p.numInputRows}%7d | " +
          f"${p.batchDuration}%8d | $st")
      }
    }
    spark.stop()
  }
}
