package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Co-located join via bucketing: joining two tables bucketed on the
  * same key must plan WITHOUT a shuffle (no Exchange above the scans) —
  * the pre-partitioning strategy for repeated joins on a 100 TB key. */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("join of co-bucketed tables plans with zero exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)

      val joined = Bucketing.read(spark, "lineitem_b")
        .join(Bucketing.read(spark, "orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      joined.collect()
      // the AQE dump appends "== Initial Plan ==" — assert on the final plan only
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange"))
      // one exchange allowed for the groupBy on o_custkey; the JOIN itself
      // must not shuffle either side
      assert(exchanges <= 1, plan.take(3000))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(1000))
      // sanity: same result as the plain join
      val plain = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
      assert(joined.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("writeBucketed is idempotent outside the default database") {
    // the stale-location cleanup must target <warehouse>/<db>.db/<table>,
    // not <warehouse>/<table> (which belongs to the DEFAULT database) —
    // the catalog, via CatalogBridge.defaultTablePath, knows the answer
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    try {
      val nations = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      Bucketing.writeBucketed(nations, "graft_tmp.nation_b", "n_nationkey", 2)
      // second write must survive the leftover warehouse directory
      Bucketing.writeBucketed(nations, "graft_tmp.nation_b", "n_nationkey", 2)
      assert(Bucketing.read(spark, "graft_tmp.nation_b").count() == nations.count())
      // and nothing was written at the default-database-style location
      val wrongLoc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "nation_b")
      val fs = wrongLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(wrongLoc))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_tmp.nation_b")
      spark.sql("DROP DATABASE IF EXISTS graft_tmp CASCADE")
    }
  }
}
