package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Bounded BFS reachability: min-hop distances, unreachable exclusion,
  * hop cap, multi-seed min, and the constraint-propagation guard that
  * keeps per-round plans from compounding. */
class GraphSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")
  private def seeds(ns: Long*) = ns.toDF("node")

  test("min-hop distances on a diamond with a shortcut") {
    //   1 → 2 → 3 → 4, plus 1 → 4 shortcut and isolated 9
    val out = Graph.reachMinHops(
        edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), seeds(1L),
        "src", "dst", "node", 10)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("maxHops truncates the frontier; unreachable nodes are absent") {
    val chain = edges((0L until 10L).map(i => (i, i + 1)): _*)
    val out = Graph.reachMinHops(chain, seeds(0L), "src", "dst", "node", 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("multiple seeds take the minimum distance; cycles terminate") {
    // cycle 1→2→3→1 plus tail 3→4; seeds at 1 and 4
    val out = Graph.reachMinHops(
        edges((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)), seeds(1L, 4L),
        "src", "dst", "node", 8)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("pageRank: integer recurrence matches a local reference fold exactly; order pinned") {
    // 1→{2,3}, 2→3, 3→1, 4→1: node 1 collects from 3 and 4 (top rank),
    // node 4 has no in-edges (stays at base)
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
    val got = Graph.pageRank(edges(pairs: _*), "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    // the same div recurrence folded locally (Scala Long / == floor
    // div on the non-negative ranks)
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val n = nodes.size
    val deg = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 5) {
      val sums = pairs.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(p => r(p._1) / deg(p._1)).sum
      }
      r = nodes.map(v => v ->
        ((1000000000L - 850000000L) / n +
          850000000L * sums.getOrElse(v, 0L) / 1000000000L)).toMap
    }
    assert(got == r)
    assert(got(4L) == (1000000000L - 850000000L) / n) // no in-edges → base only
    assert(got(1L) > got(3L) && got(3L) > got(2L) && got(2L) > got(4L))
    // conf restored after the loop
    assert(spark.conf.get("spark.sql.constraintPropagation.enabled") != "false")
  }

  test("pageRank dangling redistribution: reference fold, mass retention, no-dangling identity") {
    // 1→2, 2→3: node 3 is DANGLING (never a source) — its mass leaks
    // in the default and redistributes in the variant
    val pairs = Seq((1L, 2L), (2L, 3L))
    val leak = Graph.pageRank(edges(pairs: _*), "src", "dst", iters = 5)
      .as[(Long, Long)].collect().toMap
    val redist = Graph.pageRank(edges(pairs: _*), "src", "dst", iters = 5,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    // the same recurrence folded locally, dangling share included
    val nodes = Seq(1L, 2L, 3L)
    val n = nodes.size
    val deg = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to 5) {
      val dm = r(3L) // the only dangling node
      val extra = 850000000L * (dm / n) / 1000000000L
      val sums = pairs.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(p => r(p._1) / deg(p._1)).sum
      }
      r = nodes.map(v => v ->
        ((1000000000L - 850000000L) / n + extra +
          850000000L * sums.getOrElse(v, 0L) / 1000000000L)).toMap
    }
    assert(redist == r)
    // redistribution strictly retains more total mass than the leak,
    // and every node gains (the share adds uniformly)
    assert(redist.values.sum > leak.values.sum)
    nodes.foreach(v => assert(redist(v) >= leak(v)))
    // a graph with NO dangling nodes: variant ≡ default bit-for-bit
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val a = Graph.pageRank(edges(cycle: _*), "src", "dst", iters = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges(cycle: _*), "src", "dst", iters = 4,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRank: empty edge set returns an empty frame, not a division by zero") {
    val out = Graph.pageRank(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", iters = 3)
    assert(out.columns.toSeq == Seq("node", "rank_ppb"))
    assert(out.count() == 0L)
  }

  test("pageRank: per-round plans stay flat across iterations") {
    val ids = spark.range(300).toDF("u")
    val e1 = ids.filter(col("u") >= 1)
      .select((col("u") - 1).as("src"), col("u").as("dst"))
    val e2 = ids.select(col("u").as("src"), ((col("u") * 7) % 300).as("dst"))
      .filter(col("src") =!= col("dst"))
    val out = Graph.pageRank(e1.unionAll(e2), "src", "dst", iters = 8)
    // each round checkpoints: the final plan is a scan, not 8 stacked joins
    assert(out.queryExecution.executedPlan.toString.length < 20000)
    assert(out.count() == 300)
  }

  test("per-round plans stay flat (constraint propagation guarded)") {
    // the r26-shaped fixture at 500 nodes: without the guard the
    // round-8 physical plan is ~250k chars (measured); with it the
    // whole run's plans stay small and the final output is a flat
    // union of checkpoint scans
    val ids = spark.range(500).toDF("u")
    val e1 = ids.filter(col("u") % 4 =!= 0 && col("u") >= 1)
      .select((col("u") - 1).as("src"), col("u").as("dst"))
    val e2 = ids.filter(col("u") % 7 < 2 && col("u") >= 10)
      .select((col("u") - 10).as("src"), col("u").as("dst"))
    val s = ids.filter(col("u") % 60 === 0).select(col("u").as("node"))
    val out = Graph.reachMinHops(e1.unionAll(e2), s, "src", "dst", "node", 8)
    assert(out.queryExecution.executedPlan.toString.length < 20000)
    assert(out.count() > 9) // seeds plus genuinely expanded frontier
    // conf restored after the loop
    assert(spark.conf.get("spark.sql.constraintPropagation.enabled") != "false")
  }
}
