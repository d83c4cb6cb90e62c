package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark build plus its DuckDB oracle SQL.
  * Convention (SURVEY.md §2.4): deterministic output — explicit ORDER BY
  * over the output, aggregates computed with exact (decimal / integer /
  * order-stable-fold) arithmetic so the driver's 6-decimal rounding can
  * never straddle an engine difference, and every computed column aliased
  * identically on both sides.
  *
  * The oracle is held as a THUNK: almost every query's SQL is a static
  * string (the eager `apply` below wraps it), but a query whose oracle
  * restates parameters the RUN itself learns — l139's corpus-trained
  * merge table — needs the SQL built at dump time, after the query has
  * executed ([[graft.Verify]] dumps `oracle_sql.json` last, so a
  * [[QueryDef.dynamic]] thunk observes what the run recorded). */
final class QueryDef(
    val build: (SparkSession, String) => DataFrame,
    oracleThunk: Option[() => String]) {
  def oracle: Option[String] = oracleThunk.map(_())
}

object QueryDef {
  /** The common shape: a static oracle string (or None for rows-only). */
  def apply(build: (SparkSession, String) => DataFrame,
            oracle: Option[String]): QueryDef =
    new QueryDef(build, oracle.map(s => () => s))

  /** An oracle built at dump time — AFTER the query ran. */
  def dynamic(build: (SparkSession, String) => DataFrame,
              oracle: () => String): QueryDef =
    new QueryDef(build, Some(oracle))
}
