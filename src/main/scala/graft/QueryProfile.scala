package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Measurement-only diagnostic (guide §1): for each named query, split
  * wall time into plan (analysis+optimization+physical planning) vs
  * execute (the noop write, incl. AQE re-planning), and count jobs /
  * stages / tasks plus aggregate task time and shuffle bytes — the
  * numbers that tell fixed driver overhead apart from real work.
  * Usage: runMain graft.QueryProfile <query> [query...]  (reps via
  * SPARK_GRAFT_PROFILE_REPS, default 3; warm rep discarded).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0L
    @volatile var taskTimeMs = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    val verbose = sys.env.get("SPARK_GRAFT_PROFILE_JOBS").contains("1")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStart.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobStart.remove(e.jobId)
        if (verbose && st != null)
          println(f"[job] id=${e.jobId} ${(System.nanoTime() - st._1) / 1e9}%.3fs  ${st._2}")
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += e.stageInfo.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          taskTimeMs += m.executorRunTime
          shufWrite += m.shuffleWriteMetrics.bytesWritten
          shufRead += m.shuffleReadMetrics.totalBytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try graft.queries.RelationalQueries.ensureBucketedTables(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"prep: ${e.getMessage}") }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (0 until reps).foreach { rep =>
        jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; shufWrite = 0; shufRead = 0
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis/optimization/planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        // give async listener events a beat to drain
        Thread.sleep(200)
        println(f"[profile] $name rep=$rep build=${(t1 - t0) / 1e9}%.3f " +
          f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f " +
          f"jobs=$jobs stages=$stages tasks=$tasks taskTime=${taskTimeMs / 1e3}%.2fs " +
          f"shufW=${shufWrite / 1024}%dKiB shufR=${shufRead / 1024}%dKiB")
      }
    }
    spark.stop()
  }
}
