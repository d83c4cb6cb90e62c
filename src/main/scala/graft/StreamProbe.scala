package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Measured scale probe for the streaming near-dup claim state
 * (graft.streaming.NearDupState): replicate the dedup stream 10× and
 * record, per micro-batch, the batch latency and the stateful operators'
 * stored row counts against the horizon's distinct-band cardinality —
 * the NearDupState Scaladoc argues state scales with the horizon's band
 * cardinality, not the corpus, and this prints the measurement that
 * argument rests on (recorded in SCALE.md).
 *
 * Usage: `sbt "runMain graft.StreamProbe 5000"` (docs per run; 5 equal
 * event-time batches spanning 2.5 h against a 1 h horizon, so the later
 * batches must show EVICTION — a plateau, not monotone growth).
 */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val batches = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_streamprobe")
      .toFile.getAbsolutePath
    val src = s"$root/src"

    // deterministic corpus: 12-token docs from a seeded RNG; every 10th
    // doc is a near-dup (one word swapped) of the doc 5 back — a steady
    // 10% near-dup rate, the realistic crawl mix
    val rnd = new scala.util.Random(7)
    val texts = new Array[String](n)
    (0 until n).foreach { i =>
      texts(i) =
        if (i % 10 == 9 && i >= 5) {
          val base = texts(i - 5).split(" ")
          base.updated(6, s"tok${rnd.nextInt(50000)}").mkString(" ")
        } else (0 until 12).map(_ => s"tok${rnd.nextInt(50000)}").mkString(" ")
    }
    // 5 batches, each spanning 30 min of event time → 2.5 h total against
    // the 1 h horizon: batches 4-5 arrive after batch-1 state must evict
    val perBatch = n / batches
    (0 until batches).foreach { b =>
      val rows = (0 until perBatch).map { j =>
        val i = b * perBatch + j
        val ts = new Timestamp(1704100000000L + b * 1800000L + j.toLong * 1800000L / perBatch)
        (ts, i.toLong, texts(i))
      }
      rows.toDF("ts", "doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
    }

    val emptyBands = graft.operators.Dedup.readBandsOrEmpty(spark, s"$root/nobands")
    val stream = spark.readStream
      .schema("ts TIMESTAMP, doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1") // one written file per micro-batch
      .parquet(src)
      .withWatermark("ts", "30 minutes")
    val kept = graft.operators.Dedup.nearDupKeptStreamStateful(
      stream, "text", "ts", emptyBands, horizonMs = 3600L * 1000)
    val t0 = System.nanoTime()
    val q = kept.writeStream.format("noop")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    println(f"[probe] n=$n docs, $batches batches, wall ${wall}%.1f s")
    println("[probe] batch | input | batch_ms | state rows per operator")
    q.recentProgress.filter(_.numInputRows > 0).foreach { p =>
      val st = p.stateOperators.map(so => s"${so.operatorName}=${so.numRowsTotal}")
      println(f"[probe] ${p.batchId}%5d | ${p.numInputRows}%5d | ${p.batchDuration}%8d | " +
        st.mkString(" "))
    }
    // ground truth for the state-bound argument: distinct bands per batch
    // window vs what the claim store held
    val all = spark.read.parquet(src)
    val banded = graft.operators.Dedup.withBandColumns(all, "text", 8, 4, 3)
    val totalBands = banded.select(explode(array((0 until 4).map(b =>
      concat(lit(s"$b|"), col(s"__band$b"))): _*)).as("k")).distinct().count()
    println(s"[probe] distinct band keys over the WHOLE corpus: $totalBands " +
      "(claim state must stay well below this once eviction kicks in)")
    spark.stop()
  }
}
