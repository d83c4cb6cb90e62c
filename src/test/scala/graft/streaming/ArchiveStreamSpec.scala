package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark
import graft.sources.{Jsonl, Tables, Tar, Zip}
import graft.operators.OfficeFixtures

/**
 * Streaming/batch duality for the ARCHIVE ingest layer (the round-19
 * twin the batch-only l145/l147/l150 sources lacked): tar, zip, and
 * JSONL shards land in a parquet directory, `Tables.archiveStream`
 * reads them with `readStream` + `Trigger.AvailableNow`, and each
 * member walk — a stateless flatMap — must produce EXACTLY the batch
 * rows. This is the crawl-drop geometry at 100 TB: shards arrive
 * continuously, members flow downstream per micro-batch, and nothing
 * about the walk depends on batch boundaries.
 */
class ArchiveStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def landingZone(suffix: String)(rows: Seq[graft.sources.WarcFile]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_archive_stream_$suffix").toString
    // two writes = at least two files, so AvailableNow has real
    // multi-file progression to schedule
    val (a, b) = rows.splitAt(rows.length / 2)
    a.toDS().write.mode("append").parquet(dir)
    b.toDS().write.mode("append").parquet(dir)
    dir
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("tar member walk: stream rows == batch rows") {
    import spark.implicits._
    val archives = (0L to 9L).map(i => Tar.syntheticTar(i, s"tar doc $i 世界"))
    val dir = landingZone("tar")(archives)
    runToMemory(Tar.members(Tables.archiveStream(spark, dir)).toDF(), "as_tar")
    val got = spark.table("as_tar")
      .as[Tar.TarMember].collect().toSet
    val expected = Tar.members(archives.toDS()).collect().toSet
    assert(got == expected)
    assert(got.size == 20) // 2 members per archive, all 5 wrappings live
  }

  test("zip member walk: stream rows == batch rows") {
    import spark.implicits._
    val archives = (0L to 7L).map(i => graft.sources.WarcFile(i,
      OfficeFixtures.buildSyntheticArchiveZip(i, s"zip doc $i body")))
    val dir = landingZone("zip")(archives)
    runToMemory(Zip.members(Tables.archiveStream(spark, dir)).toDF(), "as_zip")
    val got = spark.table("as_zip").as[Zip.ZipMember].collect().toSet
    val expected = Zip.members(archives.toDS()).collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("jsonl line walk: stream rows == batch rows") {
    import spark.implicits._
    val shards = (0L to 4L).map(s =>
      Jsonl.syntheticShard(s, (0L to 3L).map(i => (s * 10 + i) -> s"line $s/$i")))
    val dir = landingZone("jsonl")(shards)
    runToMemory(Jsonl.lines(Tables.archiveStream(spark, dir)).toDF(), "as_jsonl")
    val got = spark.table("as_jsonl").as[Jsonl.JsonlLine].collect().toSet
    val expected = Jsonl.lines(shards.toDS()).collect().toSet
    assert(got == expected)
    assert(got.size == 20)
  }
}
