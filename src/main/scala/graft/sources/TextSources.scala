package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{StringType, StructType}

/**
 * Corpus ingestion for text pipelines: JSONL (one JSON document per
 * line) is the de-facto interchange format for web-scale text corpora.
 *
 * Scale posture: the schema is always EXPLICIT — schema inference scans
 * the whole input once before the real read, which is a full extra pass
 * at 100 TB. Malformed lines (ubiquitous in crawled data) are captured
 * per-row in a corrupt-record column instead of failing the job or being
 * silently dropped, so ingestion QA is a cheap aggregation over the same
 * scan rather than a separate validation pass.
 *
 * Implementation note: built on `read.text` + `from_json` rather than the
 * raw JSON source because Spark refuses plans that prune down to only the
 * internal `_corrupt_record` column of a raw JSON read
 * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented
 * workaround is caching the input, which is a non-starter at corpus
 * scale. The text+from_json form is a single pass, stays in codegen, and
 * keeps hive-style partition discovery.
 */
object TextSources {

  val CorruptCol = "corrupt_line"

  /** Read a JSONL corpus with an explicit schema. A line `from_json`
    * cannot parse yields null data columns and the raw line in
    * [[CorruptCol]]; hive-partition columns of `path` are appended. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = spark.read.text(path)
    val partCols = raw.columns.filterNot(_ == "value").map(col)
    val dataCols = schema.fieldNames.map(f => col(s"__p.`$f`").as(f))
    // the corrupt column must be a field of the from_json schema — a
    // PERMISSIVE parse of a malformed line yields a struct of nulls (not
    // a null struct), with the raw line in that designated field
    val pSchema = schema.add(CorruptCol, StringType)
    raw.withColumn("__p", from_json(col("value"), pSchema,
        java.util.Map.of("mode", "PERMISSIVE", "columnNameOfCorruptRecord", CorruptCol)))
      .select(dataCols ++ partCols :+ col(s"__p.`$CorruptCol`").as(CorruptCol): _*)
  }

  /** The well-formed rows of a [[jsonl]] read, corrupt column dropped. */
  def jsonlClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    jsonl(spark, path, schema).filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Write a corpus as JSONL, optionally hive-partitioned (e.g. by
    * language or source) so downstream per-domain reads prune at the
    * directory level. */
  def writeJsonl(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).json(path)
  }
}
