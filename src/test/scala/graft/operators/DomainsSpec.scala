package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** PSL-aware registrable domains: longest-suffix match against a
  * caller-supplied table, empty for hosts that ARE suffixes, regex
  * fallback for unknown TLDs and IP literals. */
class DomainsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val psl = Seq("com", "org", "uk", "co.uk", "org.uk", "com.au",
    "jp", "co.jp", "github.io").toDF("suffix")

  test("longest-suffix match: co.uk sites stop collapsing into co.uk") {
    val cases = Seq(
      ("https://www.bbc.co.uk/news", "bbc.co.uk"),          // 2-label suffix beats uk
      ("https://news.bbc.co.uk/x", "bbc.co.uk"),            // deeper subdomain, same key
      ("https://sub.shop.example.com.au/p", "example.com.au"),
      ("https://example.com/x", "example.com"),             // 1-label suffix
      ("https://a.b.example.org/x", "example.org"),
      ("https://myuser.github.io/repo", "myuser.github.io"), // private-section suffix
      ("https://deep.myuser.github.io/repo", "myuser.github.io"),
      ("https://tokyo.co.jp/x", "tokyo.co.jp"),             // hmm: co.jp is the suffix
      ("https://example.co.uk/", "example.co.uk"))
    val out = Domains.registrableDomainPsl(
        cases.map(_._1).toDF("url"), "url", psl, "dom")
      .select("dom").as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("a host that IS a public suffix has no registrable domain") {
    val out = Domains.registrableDomainPsl(
        Seq("https://co.uk/", "https://github.io/x", "https://com/").toDF("url"),
        "url", psl, "dom")
      .select("dom").as[String].collect().toSeq
    assert(out == Seq("", "", ""))
  }

  test("no matching rule falls back to last-two-labels; IPs cap on themselves") {
    val out = Domains.registrableDomainPsl(
        Seq("https://a.b.example.dev/x",      // .dev not in the table
          "http://192.168.0.1:8080/p",
          "http://[2001:db8::1]/x").toDF("url"),
        "url", psl, "dom")
      .select("dom").as[String].collect().toSeq
    assert(out == Seq("example.dev", "192.168.0.1", "[2001:db8::1]"))
  }

  test("plan: suffix matching is broadcast joins only — no shuffle of the URL side") {
    val urls = spark.range(100)
      .select(concat(lit("https://sub"), col("id") % 10,
        lit(".example"), col("id") % 7, lit(".co.uk/p")).as("url"))
    val plan = Domains.registrableDomainPsl(urls, "url", psl, "dom")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    // the only shuffle exchanges are the per-label-count dedups of the
    // (tiny) suffix build side — at most one per join level; the URL
    // side streams through joins without repartitioning
    val shuffles = plan.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    assert(shuffles <= 4, s"unexpected shuffle count $shuffles in:\n$plan")
  }

  private val blockedHosts = Seq("ads.example.com", "tracker.net").toDF("h")
  private val blockedDoms = Seq("badsite.org", "spam.example").toDF("d")

  test("blocklistFilter: host > domain > path priority, case-insensitive, NULL when clean") {
    val cases = Seq(
      ("https://ads.example.com/p/1", "host"),        // exact host
      ("https://ADS.EXAMPLE.COM/p/2", "host"),        // case-folded host
      ("https://shop.badsite.org/p/3", "domain"),     // subdomain of blocked domain
      ("https://badsite.org/p/4", "domain"),          // apex of blocked domain
      ("https://www.goodsite.com/ads/banner/5", "path"), // path prefix
      ("https://www.goodsite.com/p/6", null),         // clean
      ("https://sub.goodsite.com/padsx", null),       // prefix must anchor at /ads/
      // host rule outranks a domain rule that would also fire
      ("https://ads.example.com/ads/x", "host"))
    val out = Domains.blocklistFilter(cases.map(_._1).toDF("url"), "url",
        blockedHosts, blockedDoms, pathPrefixes = Seq("/ads/"))
      .select("block_reason").as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("blocklistFilter: no path rules means path never fires; helper columns are dropped") {
    val df = Domains.blocklistFilter(
      Seq("https://x.goodsite.com/ads/1").toDF("url"), "url",
      blockedHosts, blockedDoms)
    assert(df.columns.toSeq == Seq("url", "block_reason"))
    assert(df.select("block_reason").as[String].collect().toSeq == Seq(null))
  }

  test("hostLinkEdges: absolute cross-host links only, self/relative dropped, distinct, case-folded") {
    val pages = Seq(
      ("https://a.example/p/1",
        "<a href=\"https://b.example/x\">b</a> <a href=/rel>r</a> " +
          "<a href='HTTPS://C.EXAMPLE/y'>c</a> <a href=\"https://a.example/self\">me</a>"),
      ("https://a.example/p/2", // same target again — edges are distinct
        "<a href=\"https://b.example/other\">b2</a>"),
      ("https://b.example/p/1",
        "<A HREF=\"https://a.example/back\">back</A> <a href=\"ftp://f.example/z\">ftp</a>"))
      .toDF("url", "html")
    val edges = Domains.hostLinkEdges(pages, "url", "html")
      .as[(String, String)].collect().toSet
    assert(edges == Set(
      ("a.example", "b.example"),
      ("a.example", "c.example"),
      ("b.example", "a.example")))
  }

  test("domainQualityGate condemns domains by aggregate signal; subdomains pool; small domains are spared") {
    // spamfarm.biz: 12 pages across 3 subdomains, avg 800000 ppm → spam
    // tinyspam.net: 2 pages at 900000 ppm but below minDocs → spared
    // goodsite.com: 12 pages, avg 50000 ppm → clean
    val rows =
      (0 until 12).map(i => (s"https://shard$i.spamfarm.biz/p/$i", 800000L)) ++
        (0 until 2).map(i => (s"https://tinyspam.net/p/$i", 900000L)) ++
        (0 until 12).map(i => (s"https://www.goodsite.com/a/$i", 50000L))
    val out = Domains.domainQualityGate(
        rows.toDF("url", "sig"), "url", "sig", minDocs = 10, maxAvgPpm = 300000L)
      .select("domain", "domain_docs", "domain_avg_ppm", "domain_verdict")
      .distinct()
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("spamfarm.biz") == ((12L, 800000L, "spam_domain")))
    assert(out("tinyspam.net") == ((2L, 900000L, null)))
    assert(out("goodsite.com") == ((12L, 50000L, null)))
  }

  test("domainQualityGate: the average is exact integer div of mixed signals") {
    val rows = Seq(
      ("https://mixed.org/a", 100000L),
      ("https://mixed.org/b", 100001L),
      ("https://mixed.org/c", 100001L))
    val avg = Domains.domainQualityGate(
        rows.toDF("url", "sig"), "url", "sig", minDocs = 1, maxAvgPpm = 999999L)
      .select("domain_avg_ppm").distinct().as[Long].head()
    assert(avg == 300002L / 3) // floor(100000.666…) = 100000
  }

  test("plan: blocklist rule tables join broadcast; the URL side never shuffles") {
    val urls = spark.range(200)
      .select(concat(lit("https://sub"), col("id") % 10,
        lit(".site"), col("id") % 7, lit(".com/p/"), col("id")).as("url"))
    val plan = Domains.blocklistFilter(urls, "url", blockedHosts, blockedDoms,
        pathPrefixes = Seq("/ads/"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    val shuffles = plan.split("\n").count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    // only the two tiny rule-table distincts may shuffle
    assert(shuffles <= 2, s"unexpected shuffle count $shuffles in:\n$plan")
  }
}
