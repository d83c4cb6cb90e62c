package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark build plus its DuckDB oracle SQL.
  * Convention (SURVEY.md §2.4): deterministic output — explicit ORDER BY
  * over the output, aggregates computed with exact (decimal / integer /
  * order-stable-fold) arithmetic so the driver's 6-decimal rounding can
  * never straddle an engine difference, and every computed column aliased
  * identically on both sides. */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
