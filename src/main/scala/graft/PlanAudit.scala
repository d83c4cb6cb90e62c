package graft

import org.apache.spark.sql.SparkSession

/** Sweep every declared query's POST-AQE physical plan for scale red
  * flags: cartesian products, partition-less window sorts, and
  * sort-merge joins (at these sizes every join should resolve to a
  * broadcast or shuffled-hash join). Known-and-documented exceptions are
  * listed inline. Run: `sbt "runMain graft.PlanAudit [sfDir]"`. */
object PlanAudit {

  // t7 is the reference's own single-task global state (SURVEY §7.5.4);
  // l3/r11/l8 broadcast one side of a deliberately key-less join; t18's
  // triangular prefix-offset join runs over the tiny bucket-count table.
  private val allowPartitionlessWindow = Set("t7_global_state")
  private val allowNestedLoop =
    Set("l3_cosine_topk", "r11_scalar_subquery", "l8_ann_ivf", "t18_global_state_scalable")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"),
        "BroadcastNestedLoopJoin" ->
          (plan.contains("BroadcastNestedLoopJoin") && !allowNestedLoop(name)),
        // a windowspecdefinition whose argument list starts with a sort
        // order (no partition columns before it) is a single-task window
        "partitionless-window" ->
          ("windowspecdefinition\\(([^)]*)\\)".r.findAllMatchIn(plan)
            .exists(m => m.group(1).split(",")(0).contains(" ASC") ||
              m.group(1).split(",")(0).contains(" DESC"))
            && !allowPartitionlessWindow(name))
      ).collect { case (f, true) => f }
      spark.catalog.clearCache()
      if (flags.nonEmpty) { flagged += 1; println(s"[plan-audit] $name: ${flags.mkString(", ")}") }
    }
    println(s"[plan-audit] done: $flagged flagged of ${SparkEntry.queries.size}")
    spark.stop()
  }
}
