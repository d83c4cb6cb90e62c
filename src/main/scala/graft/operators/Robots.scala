package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * robots.txt compliance filtering — the retroactive-consent pass
 * curation pipelines run over already-fetched corpora (C4 re-filtered
 * CommonCrawl against robots rules; opt-out audits do the same): parse
 * each host's robots.txt into per-agent Disallow prefixes, then flag
 * URLs a given agent was not permitted to fetch. North-star extension:
 * the reference (/root/reference/src/lib.rs:1-957) has no web surface.
 *
 * Grammar subset (RFC 9309's core, the fields curation uses):
 * consecutive `User-agent:` lines open a group; the `Disallow:` lines
 * after them attach to that group; a later `User-agent:` line after
 * rules opens a NEW group. A group applies to `agent` when it names it
 * (case-insensitive) or `*`. Empty `Disallow:` (allow-all) contributes
 * no rule. `Allow:` precedence and `$`/`*` wildcards are out of scope
 * — the conservative reading (any matching Disallow prefix blocks) is
 * the audit-side convention.
 *
 * 100 TB shape: the parse explodes robots BODIES line-linearly and
 * windows PARTITION BY HOST (robots files are KB-sized — bounded
 * tasks); the rule table is one row per (host, prefix) and joins the
 * URL side SHUFFLE-HASH on host after collapsing to (host, prefixes[])
 * — one array per host, so the per-URL check is an in-row `exists`,
 * never a rules×urls join.
 */
object Robots {

  /** (host, prefix) Disallow rules applying to `agent`, parsed from
    * (hostCol, bodyCol) robots.txt rows. */
  def disallowRules(robots: DataFrame, hostCol: String, bodyCol: String,
                    agent: String = "*"): DataFrame = {
    val byHost = Window.partitionBy(col(hostCol)).orderBy(col("__rb_pos"))
    val lines = robots
      .select(col(hostCol),
        posexplode(split(col(bodyCol), "\n")).as(Seq("__rb_pos", "__rb_line")))
      .withColumn("__rb_ua",
        lower(regexp_extract(col("__rb_line"), "(?i)^\\s*user-agent:\\s*(\\S+)", 1)))
      .withColumn("__rb_isdis",
        col("__rb_line").rlike("(?i)^\\s*disallow:"))
      .withColumn("__rb_dis",
        regexp_extract(col("__rb_line"), "(?i)^\\s*disallow:\\s*(\\S*)", 1))
    // a user-agent line whose PREVIOUS line was not one starts a group
    val grouped = lines
      .withColumn("__rb_isua", col("__rb_ua") =!= "")
      .withColumn("__rb_start",
        col("__rb_isua") &&
          !coalesce(lag(col("__rb_isua"), 1).over(byHost), lit(false)))
      .withColumn("__rb_grp",
        sum(when(col("__rb_start"), 1L).otherwise(0L)).over(byHost))
    val wanted = lower(lit(agent))
    val applies = grouped
      .groupBy(col(hostCol), col("__rb_grp"))
      .agg(
        max(when(col("__rb_isua") &&
          (col("__rb_ua") === wanted || col("__rb_ua") === "*"), true)
          .otherwise(false)).as("__rb_match"),
        collect_list(when(col("__rb_isdis") && col("__rb_dis") =!= "",
          col("__rb_dis"))).as("__rb_rules"))
      .filter(col("__rb_match") && size(col("__rb_rules")) > 0)
    applies
      .select(col(hostCol), explode(col("__rb_rules")).as("prefix"))
      .distinct()
  }

  /** Adds `robots_disallowed`: true when the URL's path starts with any
    * of its host's applicable Disallow prefixes. `rules` is
    * [[disallowRules]] output (host column name must match the URL
    * side's parsed host — pass the same name). */
  def disallowedUrls(docs: DataFrame, urlCol: String,
                     rules: DataFrame, rulesHostCol: String): DataFrame = {
    val parts = TextFunctions.withUrlParts(docs, urlCol,
      hostCol = "__rb_h", domainCol = "__rb_d", normCol = "__rb_n")
      .drop("__rb_d", "__rb_n")
      .withColumn("__rb_path", coalesce(regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1), lit("")))
    val perHost = rules.groupBy(col(rulesHostCol).as("__rb_h"))
      .agg(collect_list(col("prefix")).as("__rb_pre"))
    parts
      .join(perHost.hint("shuffle_hash"), Seq("__rb_h"), "left")
      .withColumn("robots_disallowed",
        coalesce(exists(col("__rb_pre"),
          p => col("__rb_path").startsWith(p)), lit(false)))
      .drop("__rb_h", "__rb_path", "__rb_pre")
  }
}
