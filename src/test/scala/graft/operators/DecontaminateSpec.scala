package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Benchmark decontamination: n-gram collision against a broadcast
  * benchmark gram table, normalization-insensitive, every doc gets a
  * row. */
class DecontaminateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bench = Seq(
    "What is the capital of France? Paris is the capital.",
    "The quick brown fox jumps over the lazy dog.").toDF("text")

  test("verbatim and normalized-match docs are flagged; clean docs get zero rows with hits=0") {
    val docs = Seq(
      (1L, "trivia night: what is the capital of france? paris is the capital."),
      (2L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG!!!"), // case/punct differ
      (3L, "an entirely unrelated training document about cooking pasta."),
      (4L, "the quick brown cat sleeps all day long.")) // shares no 5-gram
      .toDF("doc_id", "text")
    val grams = Decontaminate.benchGrams(bench, "text", n = 5)
    val out = Decontaminate.flagContaminated(docs, "text", "doc_id", grams, n = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_hit_grams", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => r._1 -> r._3).toMap ==
      Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
    assert(out.count(_._2 == 0L) == 2)
    // doc 2 IS the benchmark sentence: all 5 of its 9-token 5-grams hit
    assert(out.find(_._1 == 2L).get._2 == 5L)
  }

  test("grams repeated inside one document count once (distinct shingles)") {
    val docs = Seq((1L,
      "the quick brown fox jumps. the quick brown fox jumps. " +
        "the quick brown fox jumps over everything.")).toDF("doc_id", "text")
    val grams = Decontaminate.benchGrams(bench, "text", n = 5)
    val hits = Decontaminate.flagContaminated(docs, "text", "doc_id", grams, n = 5)
      .select("n_hit_grams").as[Long].head()
    // normalized text repeats "the quick brown fox jumps" — the distinct
    // hit set is what counts, not occurrences
    val docGrams = Decontaminate.benchGrams(docs, "text", 5)
      .withColumnRenamed("gram", "dgram")
    val expected = docGrams.join(grams, docGrams("dgram") === grams("gram")).count()
    assert(hits == expected && hits > 0)
  }

  test("plan: the benchmark gram table broadcasts; no sort-merge join anywhere") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("document number "), col("id"),
        lit(" with some shared words about the capital of france today")).as("text"))
    val grams = Decontaminate.benchGrams(bench, "text", n = 5)
    val plan = Decontaminate.flagContaminated(docs, "text", "doc_id", grams, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }
}
