package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench: run one named query N times, print each timing; optional
  * explain. Usage: runMain graft.BenchOne <query> [reps] [explain] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val doExplain = args.contains("explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    sys.env.get("SPARK_GRAFT_WARMUP_DIR").foreach { wd =>
      val t0 = System.nanoTime()
      fn(spark, wd).write.format("noop").mode("overwrite").save()
      println(f"[bench-one] $name warmup on $wd: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[bench-one] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
