package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/**
 * Public-suffix-aware registrable-domain extraction — the exact form of
 * the per-domain politeness/capping key that
 * [[TextFunctions.registrableDomain]]'s last-two-labels regex only
 * approximates (under which every `*.co.uk` site collapses into one
 * "domain" `co.uk` and per-domain capping over-prunes whole country
 * registries). North-star extension: the reference has no URL surface
 * at all (/root/reference/src/lib.rs:1-957).
 *
 * The caller supplies the suffix table (e.g. the ~9k-row Mozilla
 * public suffix list; wildcard rules like `*.kawasaki.jp` are the
 * caller's expansion burden — expand them to explicit rows against
 * the observed hosts, the standard preprocessing). Matching follows
 * the PSL algorithm: the registrable domain is one label plus the
 * LONGEST suffix in the table that matches the host tail; a host that
 * IS a public suffix has no registrable domain (empty); a host
 * matching no rule falls back to the last-two-labels approximation
 * (the PSL's own implicit `*` rule); IP-literal hosts cap on
 * themselves (delegated to [[TextFunctions.registrableDomain]]).
 *
 * 100 TB shape: public suffixes are at most `maxSuffixLabels` dot
 * labels, so the candidate tails per host are a FIXED small set —
 * matching is `maxSuffixLabels` broadcast hash left-joins (build side
 * = the suffix rows of that exact label count, deduplicated), all
 * codegen, ZERO shuffles of the URL side, no explode, no re-group.
 * Cost per row is a handful of hash probes regardless of corpus size.
 */
object Domains {

  /**
   * Adds `out` (the PSL registrable domain of `urlCol`) to `df`.
   * `suffixes`' FIRST column is the suffix list, matched lowercased.
   */
  def registrableDomainPsl(df: DataFrame, urlCol: String,
                           suffixes: DataFrame, out: String,
                           maxSuffixLabels: Int = 4): DataFrame = {
    val sfx = suffixes.select(
      lower(col(suffixes.columns.head)).as("__sfx")).distinct()
    val host = TextFunctions.urlHost(col(urlCol))
    var d = df
      .withColumn("__labels", split(host, "\\."))
      .withColumn("__n", size(col("__labels")))
    (1 to maxSuffixLabels).foreach { k =>
      // the host's last-k-labels tail, only defined when the host is
      // at least k labels deep (slice with a negative start demands it)
      d = d.withColumn(s"__c$k",
          when(col("__n") >= k,
            array_join(slice(col("__labels"), -k, k), ".")))
        .join(broadcast(sfx
            .filter(size(split(col("__sfx"), "\\.")) === k)
            .withColumnRenamed("__sfx", s"__m$k")),
          col(s"__c$k") === col(s"__m$k"), "left")
    }
    // longest match wins (ascending fold leaves the longest-k test
    // OUTERMOST); host == suffix (no label left of it) → empty
    val psl = (1 to maxSuffixLabels).foldLeft(
      // no rule matched → the PSL's implicit `*` rule = the regex
      // approximation (which also handles IP-literal hosts)
      TextFunctions.registrableDomain(col(urlCol))) { (fallback, k) =>
      when(col(s"__m$k").isNotNull,
        when(col("__n") > k,
          array_join(slice(col("__labels"), -(k + 1), k + 1), "."))
          .otherwise(lit("")))
        .otherwise(fallback)
    }
    d.withColumn(out, psl)
      .drop("__labels" +: "__n" +:
        (1 to maxSuffixLabels).flatMap(k => Seq(s"__c$k", s"__m$k")): _*)
  }

  /**
   * URL blocklist filtering — the FineWeb/RefinedWeb curation step
   * that runs BEFORE any content is fetched or scored: kill URLs whose
   * host is on an exact blocklist (UT1-style lists run to millions of
   * hosts), whose REGISTRABLE DOMAIN is blocked (covers every
   * subdomain of a blocked site), or whose path starts with a blocked
   * prefix (`/ads/`, `/tracker/` — these lists are short). Adds `out`
   * = 'host' | 'domain' | 'path' (first match in that priority) or
   * NULL for clean rows; filter on `out IS NULL` for the kept set.
   *
   * 100 TB shape: host/domain rule tables join as BROADCAST hash joins
   * (a 4M-host list is ~100 MB — fine; beyond that drop the hint and
   * Spark picks a shuffle join on the same plan). The URL side parses
   * ONCE via [[TextFunctions.withUrlParts]]' staged projection (the
   * l64 lesson), and path prefixes fold into one per-row predicate.
   * Zero shuffles of the URL side, no explode.
   */
  def blocklistFilter(df: DataFrame, urlCol: String,
                      blockedHosts: DataFrame, blockedDomains: DataFrame,
                      pathPrefixes: Seq[String] = Nil,
                      out: String = "block_reason"): DataFrame = {
    val hosts = blockedHosts.select(
      lower(col(blockedHosts.columns.head)).as("__bh")).distinct()
    val doms = blockedDomains.select(
      lower(col(blockedDomains.columns.head)).as("__bd")).distinct()
    val parts = TextFunctions.withUrlParts(df, urlCol,
      hostCol = "__lh", domainCol = "__ld", normCol = "__ln")
      .withColumn("__lp", coalesce(regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1), lit("")))
    val pathHit = pathPrefixes.map(p => col("__lp").startsWith(lit(p)))
      .reduceOption(_ || _).getOrElse(lit(false))
    parts
      .join(broadcast(hosts), col("__lh") === col("__bh"), "left")
      .join(broadcast(doms), col("__ld") === col("__bd"), "left")
      .withColumn(out,
        when(col("__bh").isNotNull, lit("host"))
          .when(col("__bd").isNotNull, lit("domain"))
          .when(pathHit, lit("path")))
      .drop("__lh", "__ld", "__ln", "__lp", "__bh", "__bd")
  }

  /**
   * Host-level link-graph edges from crawled HTML — the raw material of
   * every link-based quality signal (PageRank-family centrality, spam
   * neighborhoods, hub/authority detection): one `href` extraction
   * pass per page, absolute http(s) targets only (relative links stay
   * on-host and carry no cross-host signal), self-loops dropped,
   * DISTINCT (src_host, dst_host) out.
   *
   * 100 TB shape: the href explode is link-linear; host extraction is
   * the same one-pass regex chain as [[TextFunctions.urlHost]] (the
   * l64-certified fragment); the only exchange is the edge `distinct`,
   * which map-side combines (a host linking to the same host from a
   * million pages collapses per partition before the shuffle).
   */
  def hostLinkEdges(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame =
    pages
      .select(TextFunctions.urlHost(col(urlCol)).as("src_host"),
        explode(regexp_extract_all(col(htmlCol),
          lit("(?i)href=[\"']?([^\"' >]+)"), lit(1))).as("__lk_href"))
      .filter(col("__lk_href").rlike("(?i)^https?://"))
      .select(col("src_host"),
        TextFunctions.urlHost(col("__lk_href")).as("dst_host"))
      .filter(col("dst_host") =!= col("src_host") && col("dst_host") =!= "")
      .distinct()

  /**
   * MEASURED domain-level quality gating — the FineWeb curation step a
   * static blocklist ([[blocklistFilter]]) cannot do: aggregate a
   * per-document quality signal (an integer ppm — e.g.
   * [[Scoring.repetitionSignals]]' duplicate-line fraction) by
   * REGISTRABLE DOMAIN and condemn domains whose aggregate behavior is
   * spammy. Content farms publish thousands of individually-borderline
   * pages; the domain-level average is the separating signal.
   *
   * Adds `domain`, `domain_docs`, `domain_avg_ppm` (exact integer
   * `div`), and `out` = 'spam_domain' when the domain has at least
   * `minDocs` pages AND average signal ≥ `maxAvgPpm`, else NULL (keep
   * via `out IS NULL`).
   *
   * 100 TB shape: URLs parse ONCE ([[TextFunctions.withUrlParts]]'
   * staged projection); the per-domain agg partial-aggregates map-side
   * (associative count/sum — a skewed mega-domain combines before the
   * exchange); the stats table is ~one row per distinct domain (1e8 at
   * crawl scale — too big to assume broadcastable, unlike l93's RULE
   * tables), so it joins back SHUFFLE-HASH on the domain key.
   */
  def domainQualityGate(docs: DataFrame, urlCol: String, signalCol: String,
                        minDocs: Long, maxAvgPpm: Long,
                        out: String = "domain_verdict"): DataFrame = {
    val parts = TextFunctions.withUrlParts(docs, urlCol,
      hostCol = "__dqh", domainCol = "domain", normCol = "__dqn")
      .drop("__dqh", "__dqn")
    val stats = parts.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"),
        sum(col(signalCol).cast("long")).as("__dqs"))
      .withColumn("domain_avg_ppm", expr("__dqs div domain_docs"))
      .drop("__dqs")
    parts
      .join(stats.hint("shuffle_hash"), Seq("domain"))
      .withColumn(out,
        when(col("domain_docs") >= minDocs &&
          col("domain_avg_ppm") >= maxAvgPpm, lit("spam_domain")))
  }
}
