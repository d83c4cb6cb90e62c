package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling}

/**
 * End-to-end training-data curation pipeline assembled from the graft
 * operators — the workload this engine is built for at 100 TB:
 *
 *   documents → quality filter → exact+near dedup cascade →
 *   language ID / token stats enrichment → stratified sample →
 *   curated parquet
 *
 * Every stage is a declarative DataFrame transform, so the whole
 * pipeline is ONE Catalyst plan per output: pushdown reaches the scan,
 * dedup's one wide shuffle is the only exchange until the sample window.
 * Run: `sbt "runMain graft.examples.PipelineDemo [sfDir] [outDir]"`.
 */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/pipeline-demo")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. quality gate: length band + whitespace sanity
    val quality = docs.filter(
      length(col("text")).between(50, 5000) &&
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))) / length(col("text")) > 0.05)

    // 2. dedup cascade: exact (min id wins) + MinHash-LSH near-dups
    val deduped = Dedup.dedupCorpus(quality, "text", "doc_id", jaccardThreshold = 0.8)

    // 3. enrichment: token counts + fingerprint (codegen'd expressions)
    val enriched = deduped
      .withColumn("n_tokens", TextFunctions.wsTokenCount(col("text")))
      .withColumn("n_bpeish", TextFunctions.bpeishTokenCount(col("text")))
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))

    // 4. deterministic per-language sample for eval/inspection splits
    val sample = Sampling.stratifiedSample(enriched, "lang", "doc_id", 50)

    enriched.write.mode("overwrite").parquet(s"$outDir/curated")
    sample.write.mode("overwrite").parquet(s"$outDir/sample")

    val kept = spark.read.parquet(s"$outDir/curated").count()
    val sampled = spark.read.parquet(s"$outDir/sample").count()
    println(s"[pipeline-demo] $total docs -> quality ${quality.count()} -> " +
      s"deduped $kept curated (+ $sampled sampled) -> $outDir")
    spark.stop()
  }
}
