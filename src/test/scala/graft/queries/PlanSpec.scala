package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.SparkEntry

/**
 * Plan-shape guards: the scale properties the queries rely on, asserted
 * against the optimized physical plan so a regression (lost pushdown, a
 * broadcast that became a shuffle, a fallen-out-of-codegen hot path)
 * fails CI rather than surfacing as a 100× slowdown at scale.
 */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Final (post-AQE) physical plan: execute first — AdaptiveSparkPlan
    * only materializes join choices and WholeStageCodegen spans after the
    * run. */
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("r1: dimension join broadcasts; no cartesian anywhere") {
    val p = planOf("r1_join_agg")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("r2: shipdate filter is pushed to the parquet scan") {
    val p = planOf("r2_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("r2: scan reads only the needed lineitem columns") {
    val p = planOf("r2_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // 7 needed columns; the full table has 16
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(readSchema.contains("l_returnflag"), readSchema)
  }

  test("r4/r6: semi and anti joins stay hash joins on the key") {
    assert(planOf("r4_anti_join").contains("LeftAnti"))
    assert(planOf("r6_semi_join").contains("LeftSemi"))
  }

  test("t2: value filter is pushed to the events scan") {
    val p = planOf("t2_filter")
    assert(p.contains("PushedFilters: [IsNotNull(value), GreaterThan(value"), p.take(2000))
  }

  test("l3: corpus is not shuffled for brute-force search (query side broadcasts)") {
    val p = planOf("l3_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("l4: signature aggregation happens before the only wide shuffle") {
    val p = planOf("l4_minhash_lsh")
    // partial aggregation of the k mins must appear below the exchange
    assert(p.contains("partial_min"), p.take(3000))
  }

  test("t1/t3: narrow pipelines stay inside whole-stage codegen") {
    // codegen'd stages print as `*(n)` in the final plan
    assert(planOf("t3_map").contains("*(1) Project"))
  }

  test("r8: as-of join is a single partition-sort pass, not a join blow-up") {
    val p = planOf("r8_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(2000))
  }
}
