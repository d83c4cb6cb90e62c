package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}. Results are
  * materialized with a noop-format write — unlike count(), that executes
  * the full plan (all columns, final sort) without touching disk. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm each query once at the smallest SF before timing it at the
    // target SF: Janino whole-stage-codegen compilation is a one-shot
    // cost (measured up to 10 s on the widest generated aggregates) that
    // would otherwise be billed to whichever query runs first with a
    // given code shape. The generated-class cache is keyed on source, so
    // the warm run at sf0.001 compiles what the timed run reuses.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                dir: String, name: String): Unit = {
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed on $dir: ${e.getMessage}")
      }
      // the dedup operators persist() intermediates; drop them so caches
      // don't accumulate across 40+ queries and GC-churn the tail
      spark.catalog.clearCache()
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (name, fn) => runOnce(fn, warmDir, name) }
    // best-of-N (default 2): single-shot timings on a shared box are
    // noisy (observed 3-10x spikes from transient load); the minimum is
    // the standard way to report the query's actual cost
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = ordered.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        runOnce(fn, sfDir, name)
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
