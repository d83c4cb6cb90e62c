package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.api.{Env, Event}

/**
 * Checkpoint recovery: a streaming facade query stopped and restarted
 * with the same checkpoint must resume its keyed state, not restart it —
 * the operability property a long-lived 100 TB pipeline leans on (an
 * executor loss or planned restart must never reset running state).
 * Proven for both state backends: flatMapGroupsWithState and
 * transformWithState + RocksDB (`spark.graft.stateful.tws`).
 */
class StateRecoverySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(v: Long, t: String): Event[Long] =
    Event.at(v, Timestamp.valueOf(t))

  /** Two AvailableNow runs over a growing source dir sharing one
    * checkpoint: the second run must process ONLY the new file and
    * continue the per-key running counts where the first left off. */
  private def recoveryScenario(tag: String): Unit = {
    val root = java.nio.file.Files.createTempDirectory(s"graft_recovery_$tag")
      .toFile.getAbsolutePath
    val src = s"$root/src"; val ckpt = s"$root/ckpt"; val out = s"$root/out"

    def writeBatch(events: Seq[Event[Long]]): Unit =
      spark.createDataset(events).write.mode("append").parquet(src)

    def runOnce(): Unit = {
      val schema = implicitly[Encoder[Event[Long]]].schema
      val stream = spark.readStream.schema(schema).parquet(src).as[Event[Long]]
      val counts = Env(spark).fromDataset(stream)
        .keyBy(_.value % 2)
        .processState((_: Long) => 0L) { (k, e, n) =>
          (n + 1, Seq(e.withValue((k, n + 1))))
        }
      val q = counts.ds.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(Seq(ev(0, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:01:00")))
    runOnce()
    val first = spark.read.parquet(out).as[Event[(Long, Long)]]
      .collect().map(_.value).toSet
    assert(first == Set((0L, 1L), (1L, 1L)), s"first run: $first")

    writeBatch(Seq(ev(2, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00")))
    runOnce() // same checkpoint: counts must CONTINUE at 2, not restart at 1
    val all = spark.read.parquet(out).as[Event[(Long, Long)]]
      .collect().map(_.value).toSet
    assert(all == Set((0L, 1L), (1L, 1L), (0L, 2L), (1L, 2L)), s"after restart: $all")
  }

  test("keyed state survives a restart from the checkpoint (flatMapGroupsWithState)") {
    recoveryScenario("fmgws")
  }

  test("keyed state survives a restart from the checkpoint (transformWithState + RocksDB)") {
    val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.graft.stateful.tws", "true")
    try recoveryScenario("tws")
    finally {
      spark.conf.unset("spark.graft.stateful.tws")
      prevProv match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
