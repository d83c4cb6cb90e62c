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

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back. */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
