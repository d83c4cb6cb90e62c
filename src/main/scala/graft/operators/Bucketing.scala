package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: pre-shuffle a fact table ONCE into hash
 * buckets on its join key so every subsequent join/aggregation on that
 * key is exchange-free — the amortization that matters when the same
 * 100 TB table joins on the same key across many queries. (Bucket
 * metadata lives in the session catalog; on a real deployment this is a
 * persistent metastore.)
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Idempotent across
    * JVMs: with the in-memory catalog, a previous run's table metadata
    * dies with its session but the warehouse FILES survive, and CTAS
    * refuses a non-empty location — so drop any current table and clear
    * the stale directory before writing. The location comes from the
    * catalog itself (CatalogBridge.defaultTablePath), so current-database
    * resolution and identifier normalization match `saveAsTable` exactly. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.graft.CatalogBridge.defaultTablePath(spark, table))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  /** Read a bucketed table back. */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Drop a managed table AND its warehouse files — the catalog-level
    * DROP alone leaves the directory behind with the in-memory catalog
    * (see writeBucketed), which both litters `spark-warehouse` and trips
    * the next session's CTAS. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      org.apache.spark.sql.graft.CatalogBridge.defaultTablePath(spark, table))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }
}
