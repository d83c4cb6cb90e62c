package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (never stopped — the forked
  * test JVM exits). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // static conf: needed by the bucketed-table specs
    .config("spark.sql.warehouse.dir",
      new java.io.File("target/test-warehouse").getAbsolutePath)
    .getOrCreate()
}
