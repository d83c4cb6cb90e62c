package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ShardWriterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writeShards: lossless roundtrip, one file per shard, in-file doc order") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    ShardWriter.writeShards(docs, "text", "doc_id", "source", dir,
      tokenBudget = 2000L)

    val back = spark.read.parquet(dir)

    // lossless: same documents, no duplication
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().toSet ==
      docs.select("doc_id").as[Long].collect().toSet)

    // shard values equal the l30 assignment rule recomputed on the input
    val expected = ShardWriter.assignShards(docs, "text", "doc_id", "source", 2000L)
      .select(col("doc_id"), col("shard")).as[(Long, Long)].collect().toMap
    val got = back.select(col("doc_id"), col("shard").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected)

    // one data file per (source, shard) directory
    val shardDirs = Files.list(Paths.get(dir)).filter(_.toFile.isDirectory)
      .flatMap(p => Files.list(p).filter(_.toFile.isDirectory))
    shardDirs.forEach { sd =>
      val files = sd.toFile.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$sd has ${files.length} files")
    }

    // documents appear in doc_id order inside each file
    val order = back
      .withColumn("__file", input_file_name())
      .withColumn("__pos", monotonically_increasing_id())
      .select("__file", "doc_id", "__pos")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    order.values.foreach { rows =>
      val ids = rows.sortBy(_._3).map(_._2).toSeq
      assert(ids == ids.sorted, s"out-of-order docs in ${rows.head._1}")
    }
  }
}
