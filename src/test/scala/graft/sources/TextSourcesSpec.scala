package graft.sources

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.TestSpark

class TextSourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("lang", StringType)

  test("jsonl roundtrip preserves rows; partitionBy prunes by directory") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    TextSources.writeJsonl(docs, dir, Seq("lang"))
    val back = TextSources.jsonlClean(spark, dir, new StructType()
      .add("doc_id", LongType).add("text", StringType))
    assert(back.count() == docs.count())
    // partition pruning: a lang filter must turn into a PartitionFilter,
    // not a data filter over the full scan
    val en = back.filter($"lang" === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan.take(1500))
    assert(en.count() == docs.filter($"lang" === "en").count())
  }

  test("malformed lines are quarantined per-row, not fatal and not dropped") {
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      Seq(
        """{"doc_id": 1, "text": "good one", "lang": "en"}""",
        """{"doc_id": 2, "text": "truncated...""", // malformed
        """{"doc_id": 3, "text": "also fine", "lang": "de"}"""
      ).mkString("\n").getBytes(StandardCharsets.UTF_8))
    val all = TextSources.jsonl(spark, dir, schema)
    assert(all.count() == 3)
    val bad = all.filter(all.col(TextSources.CorruptCol).isNotNull)
      .select(TextSources.CorruptCol).as[String].collect().toSeq
    assert(bad.size == 1 && bad.head.contains("truncated"))
    val clean = TextSources.jsonlClean(spark, dir, schema)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }
}
