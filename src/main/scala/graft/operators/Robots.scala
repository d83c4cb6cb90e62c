package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * robots.txt compliance filtering — the retroactive-consent pass
 * curation pipelines run over already-fetched corpora (C4 re-filtered
 * CommonCrawl against robots rules; opt-out audits do the same): parse
 * each host's robots.txt into per-agent Allow/Disallow prefix rules,
 * then flag URLs a given agent was not permitted to fetch. North-star
 * extension: the reference (/root/reference/src/lib.rs:1-957) has no
 * web surface.
 *
 * Grammar subset (RFC 9309's core, the fields curation uses):
 * consecutive `User-agent:` lines open a group; the `Allow:` /
 * `Disallow:` lines after them attach to that group; a later
 * `User-agent:` line after rules opens a NEW group. Group selection
 * follows RFC 9309 §2.2.1: groups NAMING the agent (case-insensitive)
 * are obeyed — merged when several match — and the `*` groups apply
 * ONLY when no named group exists for that host (a crawler with its
 * own section does not also inherit the generic one). Empty rule
 * paths (bare `Disallow:` = allow-all) contribute no rule.
 *
 * Decision (RFC 9309 §2.2.2): the MOST SPECIFIC matching rule wins —
 * most octets in the RULE PATH (wildcards counted as written); an
 * Allow and Disallow of equal length tie in favor of Allow; no
 * matching rule means allowed. `Disallow: /` + `Allow: /public/`
 * carve-outs therefore resolve correctly. The URL is matched on its
 * path INCLUDING the query string (RFC 9309 §2.2.3), with the empty
 * path of a bare-host URL read as `/`. Rule paths support the full
 * RFC 9309 §2.2.3 special characters: `*` matches any character run
 * and a TRAILING `$` anchors the match at the path's end (a
 * non-trailing `$` is literal); wildcard-free rules stay on the plain
 * `startsWith` fast path, wildcard rules carry an anchored regex
 * (every other metacharacter quoted) built once per rule in the
 * KB-bounded rule table and evaluated per matching URL.
 *
 * 100 TB shape: the parse explodes robots BODIES line-linearly and
 * windows PARTITION BY HOST (robots files are KB-sized — bounded
 * tasks); the rule table is one row per (host, prefix, allow) and
 * joins the URL side SHUFFLE-HASH on host after collapsing to
 * (host, rules[]) — one array per host, so the per-URL decision is an
 * in-row filter + argmax over a KB-bounded array, never a rules×urls
 * join.
 */
object Robots {

  /** (host, prefix, allow) rules applying to `agent`, parsed from
    * (hostCol, bodyCol) robots.txt rows. `allow` = false for
    * `Disallow:` lines, true for `Allow:` carve-outs. */
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
      .withColumn("__rb_isallow",
        col("__rb_line").rlike("(?i)^\\s*allow:"))
      .withColumn("__rb_path",
        regexp_extract(col("__rb_line"), "(?i)^\\s*(?:dis)?allow:\\s*(\\S*)", 1))
    // a user-agent line whose PREVIOUS line was not one starts a group
    val grouped = lines
      .withColumn("__rb_isua", col("__rb_ua") =!= "")
      .withColumn("__rb_start",
        col("__rb_isua") &&
          !coalesce(lag(col("__rb_isua"), 1).over(byHost), lit(false)))
      .withColumn("__rb_grp",
        sum(when(col("__rb_start"), 1L).otherwise(0L)).over(byHost))
    val wanted = lower(lit(agent))
    val perGroup = grouped
      .groupBy(col(hostCol), col("__rb_grp"))
      .agg(
        max(when(col("__rb_isua") && col("__rb_ua") === wanted, true)
          .otherwise(false)).as("__rb_named"),
        max(when(col("__rb_isua") && col("__rb_ua") === "*", true)
          .otherwise(false)).as("__rb_star"),
        collect_list(when(
          (col("__rb_isdis") || col("__rb_isallow")) && col("__rb_path") =!= "",
          struct(col("__rb_path").as("prefix"),
            col("__rb_isallow").as("allow")))).as("__rb_rules"))
    // RFC 9309 §2.2.1 group selection: named groups win outright — the
    // star groups apply only on hosts with NO group naming the agent.
    // The host-keyed window rides the same partitioning as the agg.
    val applies = perGroup
      .withColumn("__rb_hasnamed",
        max(col("__rb_named")).over(Window.partitionBy(col(hostCol))))
      .filter((col("__rb_named") ||
        (col("__rb_star") && !col("__rb_hasnamed"))) &&
        size(col("__rb_rules")) > 0)
    applies
      .select(col(hostCol), explode(col("__rb_rules")).as("__rb_r"))
      .select(col(hostCol), col("__rb_r.prefix").as("prefix"),
        col("__rb_r.allow").as("allow"))
      .distinct()
  }

  /** Adds `robots_disallowed`: true when the most specific (longest
    * rule path) rule matching the URL's path+query is a Disallow —
    * equal-length Allow/Disallow ties go to Allow, no match means
    * allowed (RFC 9309 §2.2.2); `*`/trailing-`$` wildcards honored
    * (§2.2.3). `rules` is [[disallowRules]] output (host column name
    * must match the URL side's parsed host — pass the same name). */
  def disallowedUrls(docs: DataFrame, urlCol: String,
                     rules: DataFrame, rulesHostCol: String): DataFrame = {
    val parts = TextFunctions.withUrlParts(docs, urlCol,
      hostCol = "__rb_h", domainCol = "__rb_d", normCol = "__rb_n")
      .drop("__rb_d", "__rb_n")
      // path + query, fragment excluded; a bare-host URL's empty path
      // reads as '/' per RFC 9309 (so 'Disallow: /' blocks the root),
      // and a bare host with only a query gets the implied '/' back
      .withColumn("__rb_raw", regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1))
      .withColumn("__rb_path",
        when(col("__rb_raw").startsWith("/"), col("__rb_raw"))
          .otherwise(concat(lit("/"), col("__rb_raw"))))
    // wildcard rules build their regex STRING once here, on the
    // KB-bounded rule table: a trailing '$' becomes the regex end
    // anchor, '*' becomes '.*', every other metacharacter is quoted.
    // The JVM still Pattern-compiles at match time (regexp_like's
    // single-slot cache thrashes when a host carries >1 wildcard
    // rule), so the match cost is per (URL × wildcard rule) — bounded
    // by the rare wildcard rules only: wildcard-free rules keep
    // `wild = false` and never touch the regex engine, which is the
    // overwhelming majority of real rule sets.
    val anchored = col("prefix").endsWith("$")
    val body = when(anchored,
      expr("substring(prefix, 1, length(prefix) - 1)")).otherwise(col("prefix"))
    val quoted = regexp_replace(
      regexp_replace(body, "([.^$+?(){}\\[\\]|\\\\])", "\\\\$1"),
      "\\*", ".*")
    val enriched = rules
      .select(col(rulesHostCol).as("__rb_h"), col("prefix"), col("allow"))
      .withColumn("__rb_wild",
        col("prefix").contains("*") || anchored)
      .withColumn("__rb_rx",
        concat(lit("^"), quoted, when(anchored, lit("$")).otherwise(lit(""))))
    val perHost = enriched.groupBy(col("__rb_h"))
      .agg(collect_list(struct(col("prefix"), col("allow"),
        col("__rb_wild").as("wild"), col("__rb_rx").as("rx"))).as("__rb_pre"))
    // most specific match = lexicographic max of (rule-path OCTETS,
    // allow-bit) over matching rules — struct comparison orders field
    // by field, so longest wins and an exact-length tie favors Allow.
    // Octets (UTF-8 bytes, RFC 9309 §2.2.2's measure), not code
    // points: a multi-byte rule path is more specific than its
    // code-point count suggests
    val matches = filter(col("__rb_pre"), r =>
      when(r("wild"), regexp_like(col("__rb_path"), r("rx")))
        .otherwise(col("__rb_path").startsWith(r("prefix"))))
    val best = array_max(transform(matches,
      r => struct(octet_length(r("prefix")).as("l"), r("allow").as("a"))))
    parts
      .join(perHost.hint("shuffle_hash"), Seq("__rb_h"), "left")
      .withColumn("robots_disallowed",
        coalesce(!best("a"), lit(false)))
      .drop("__rb_h", "__rb_raw", "__rb_path", "__rb_pre")
  }
}
