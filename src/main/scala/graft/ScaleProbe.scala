package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 10× scale-up probe for the documents-table operators: replicate the
  * sf0.1 corpus 10× (shifted doc_ids, same sources, same texts — a
  * dup-heavy worst case for the novelty/overlap shuffles) and compare
  * warm timings per query at 1× vs 10×. A ratio well under 10 means the
  * plan's constant factors (stage scheduling, broadcasts) still
  * dominate; a ratio ≈ 10 is the linear regime; anything over ~12
  * flags a super-linear shuffle. Results recorded in SCALE.md.
  *
  * Usage: runMain graft.ScaleProbe [query ...] (default: l51–l54) */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val queries = if (args.nonEmpty) args.toSeq
      else Seq("l51_pii_redact", "l52_ngram_novelty",
        "l53_source_overlap", "l54_source_divergence")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir10 = java.nio.file.Files.createTempDirectory("scaleprobe").toString
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until 10).map(k =>
        docs.withColumn("doc_id", col("doc_id") + lit(k.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .write.parquet(s"$dir10/documents.parquet")
    val embs = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until 10).map(k =>
        embs.withColumn("vec_id", col("vec_id") + lit(k.toLong * 10000000L)))
      .reduce(_ unionAll _)
      .write.parquet(s"$dir10/embeddings.parquet")
    // events replicate ALONG TIME (each copy shifted past the ~30-day
    // span), not stacked onto the same instants: 10× the data as a
    // 10×-longer stream. Stacking would instead densify every join
    // horizon 10× and grow interval-join OUTPUT ~100× — a different
    // (also interesting) regime, but not the "same workload, more days"
    // question this probe asks.
    val evts = graft.sources.Tables.events(spark, base)
    (0 until 10).map(k =>
        evts.withColumn("event_id", col("event_id") + lit(k.toLong * 100000000L))
          .withColumn("ts", col("ts") + expr(s"INTERVAL ${k * 35} DAYS")))
      .reduce(_ unionAll _)
      .write.parquet(s"$dir10/events.parquet")

    // lineitem replicates with shifted order keys (r27 profiling probe)
    val lin = spark.read.parquet(s"$base/lineitem.parquet")
    (0 until 10).map(k =>
        lin.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 100000000L)))
      .reduce(_ unionAll _)
      .write.parquet(s"$dir10/lineitem.parquet")

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- queries) {
      val fn = SparkEntry.queries(q)
      time(fn, base); time(fn, dir10) // warm both paths (codegen, scans)
      val t1 = (1 to 2).map(_ => time(fn, base)).min
      val t10 = (1 to 2).map(_ => time(fn, dir10)).min
      println(f"[scale-probe] $q: 1x=$t1%.2f s 10x=$t10%.2f s ratio=${t10 / t1}%.1f")
    }
    spark.stop()
  }
}
