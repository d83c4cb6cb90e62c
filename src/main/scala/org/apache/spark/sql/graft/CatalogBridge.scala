package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Managed-table path resolution lives behind the `private[sql]`
  * `sessionState` (same customary extension-subpackage pattern as
  * [[ColumnBridge]]). Re-exported so graft can ask the catalog where a
  * managed table WOULD live — current database, `Locale.ROOT` identifier
  * normalization, and database location all resolved by the same code
  * `saveAsTable` itself uses, instead of re-deriving
  * `<warehouse>/<name.toLowerCase>` by hand (wrong outside the default
  * database, and default-locale lowercasing diverges from the catalog's
  * ROOT semantics). */
object CatalogBridge {
  def defaultTablePath(spark: SparkSession, table: String): java.net.URI = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState
    ss.catalog.defaultTablePath(ss.sqlParser.parseTableIdentifier(table))
  }
}
