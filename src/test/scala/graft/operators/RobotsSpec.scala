package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** robots.txt subset parse: user-agent group boundaries, agent/star
  * applicability, empty-Disallow drop, Allow carve-out precedence
  * (RFC 9309 longest-match), and URL prefix flagging. */
class RobotsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val robots = Seq(
    ("a.example",
      "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n\n" +
        "User-agent: evilbot\nDisallow: /"),
    ("b.example",
      "User-agent: graftbot\nUser-agent: helper\nDisallow: /ads/\n\n" +
        "User-agent: other\nDisallow: /all/"),
    ("c.example",
      "User-agent: *\nDisallow:\n"), // empty Disallow = allow-all
    ("d.example",
      "# comment only\nSitemap: https://d.example/s.xml"))
    .toDF("host", "body")

  test("disallowRules: group boundaries, multi-agent groups, star fallback, empty rule dropped") {
    val got = Robots.disallowRules(robots, "host", "body", agent = "graftbot")
      .as[(String, String, Boolean)].collect().toSet
    assert(got == Set(
      ("a.example", "/private/", false), // star group applies to graftbot
      ("a.example", "/tmp/", false),
      ("b.example", "/ads/", false)))    // named in the two-agent group; 'other' group not
    // RFC 9309 §2.2.1: evilbot has its OWN group on a.example, so it
    // obeys only that group — the star group does NOT also apply;
    // b.example names neither evilbot nor *, so contributes nothing
    val evil = Robots.disallowRules(robots, "host", "body", agent = "evilbot")
      .as[(String, String, Boolean)].collect().toSet
    assert(evil == Set(("a.example", "/", false)))
  }

  test("named groups merge; the star group applies only where no named group exists") {
    val r = Seq(
      // two separate groups both naming the agent → their rules merge
      ("p.example", "User-agent: graftbot\nDisallow: /a/\n\n" +
        "User-agent: *\nDisallow: /star/\n\n" +
        "User-agent: graftbot\nDisallow: /b/"),
      // only a star group → it applies
      ("q.example", "User-agent: *\nDisallow: /s/"))
      .toDF("host", "body")
    val got = Robots.disallowRules(r, "host", "body", agent = "graftbot")
      .as[(String, String, Boolean)].collect().toSet
    assert(got == Set(
      ("p.example", "/a/", false), ("p.example", "/b/", false),
      ("q.example", "/s/", false)))
  }

  test("disallowedUrls flags matching paths only; unknown hosts pass") {
    val rules = Robots.disallowRules(robots, "host", "body", agent = "graftbot")
    val urls = Seq(
      "https://a.example/private/x",   // blocked
      "https://a.example/tmp/y",       // blocked
      "https://a.example/public/z",    // clean
      "https://a.example/privateer",   // prefix must anchor the full segment string
      "https://b.example/ads/banner",  // blocked
      "https://b.example/all/page",    // 'other' group — not ours
      "https://zzz.example/private/x") // no robots at all
      .toDF("url")
    val got = Robots.disallowedUrls(urls, "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap
    assert(got("https://a.example/private/x"))
    assert(got("https://a.example/tmp/y"))
    assert(!got("https://a.example/public/z"))
    assert(!got("https://a.example/privateer")) // "/private/" does not prefix "/privateer"
    assert(got("https://b.example/ads/banner"))
    assert(!got("https://b.example/all/page"))
    assert(!got("https://zzz.example/private/x"))
  }

  test("Allow carve-out: longest match wins, regardless of in-group rule order") {
    // disallow-then-allow and allow-then-disallow must decide the same
    // (RFC 9309 is order-independent: specificity, not position)
    val carve = Seq(
      ("e.example", "User-agent: *\nDisallow: /\nAllow: /public/"),
      ("f.example", "User-agent: *\nAllow: /public/\nDisallow: /"),
      // deeper disallow nested inside an allow carve-out
      ("g.example", "User-agent: *\nDisallow: /\nAllow: /public/\nDisallow: /public/secret/"))
      .toDF("host", "body")
    val rules = Robots.disallowRules(carve, "host", "body")
    val urls = Seq(
      "https://e.example/anything",        // Disallow: / wins
      "https://e.example/public/ok",       // Allow: /public/ longer → allowed
      "https://f.example/anything",
      "https://f.example/public/ok",
      "https://g.example/public/ok",
      "https://g.example/public/secret/x") // deepest rule is a Disallow
      .toDF("url")
    val got = Robots.disallowedUrls(urls, "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap
    assert(got("https://e.example/anything"))
    assert(!got("https://e.example/public/ok"))
    assert(got("https://f.example/anything"))
    assert(!got("https://f.example/public/ok"))
    assert(!got("https://g.example/public/ok"))
    assert(got("https://g.example/public/secret/x"))
  }

  test("equal-length Allow/Disallow tie goes to Allow; bare-host path reads as '/'") {
    val tied = Seq(
      ("h.example", "User-agent: *\nDisallow: /p/\nAllow: /p/"),
      ("i.example", "User-agent: *\nDisallow: /"))
      .toDF("host", "body")
    val rules = Robots.disallowRules(tied, "host", "body")
    val urls = Seq(
      "https://h.example/p/x",    // tie at length 3 → Allow
      "https://i.example",        // bare host: empty path = '/' → blocked
      "https://i.example/",       // explicit root → blocked
      "https://i.example?q=1")    // bare host with query → implied '/?q=1'
      .toDF("url")
    val got = Robots.disallowedUrls(urls, "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap
    assert(!got("https://h.example/p/x"))
    assert(got("https://i.example"))
    assert(got("https://i.example/"))
    assert(got("https://i.example?q=1"))
  }

  test("RFC 9309 wildcards: * spans any run, trailing $ anchors, other metachars literal") {
    val wild = Seq(
      ("k.example", "User-agent: *\nDisallow: /*.pdf$"),
      ("l.example", "User-agent: *\nDisallow: /private*"),
      // literal '.' must not become regex any-char; mid-rule '$' is literal
      ("m.example", "User-agent: *\nDisallow: /a.b\nDisallow: /x$y"),
      // wildcard Allow carve-out inside a full block: longest RULE PATH
      // (wildcards counted as written) wins
      ("n.example", "User-agent: *\nDisallow: /\nAllow: /public/*.html$"))
      .toDF("host", "body")
    val rules = Robots.disallowRules(wild, "host", "body")
    val urls = Seq(
      "https://k.example/file.pdf",       // blocked (anchored match)
      "https://k.example/a/deep/b.pdf",   // blocked (* spans directories)
      "https://k.example/file.pdfx",      // NOT blocked ($ anchors)
      "https://k.example/file.pdf?x=1",   // NOT blocked (query breaks the anchor)
      "https://l.example/privateer",      // blocked (trailing * = prefix)
      "https://l.example/pub",            // clean
      "https://m.example/a.b/z",          // blocked (literal dot)
      "https://m.example/aXb/z",          // NOT blocked (dot is not any-char)
      "https://m.example/x$y/z",          // blocked (literal mid-rule $)
      "https://n.example/public/p.html",  // allowed (wildcard Allow, 15 > 1)
      "https://n.example/public/p.css")   // blocked (only Disallow: / matches)
      .toDF("url")
    val got = Robots.disallowedUrls(urls, "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap
    assert(got("https://k.example/file.pdf"))
    assert(got("https://k.example/a/deep/b.pdf"))
    assert(!got("https://k.example/file.pdfx"))
    assert(!got("https://k.example/file.pdf?x=1"))
    assert(got("https://l.example/privateer"))
    assert(!got("https://l.example/pub"))
    assert(got("https://m.example/a.b/z"))
    assert(!got("https://m.example/aXb/z"))
    assert(got("https://m.example/x$y/z"))
    assert(!got("https://n.example/public/p.html"))
    assert(got("https://n.example/public/p.css"))
  }

  test("specificity is measured in octets (RFC 9309), not code points") {
    // Disallow '/日本' = 3 code points / 7 UTF-8 octets; the wildcard
    // Allow '/*ab$' = 5 of each. A path matching BOTH decides
    // differently under the two measures: code points rank the Allow
    // (5 > 3) → kept; octets rank the Disallow (7 > 5) → blocked.
    // RFC 9309 §2.2.2 says octets.
    val r = Seq(("o.example", "User-agent: *\nDisallow: /日本\nAllow: /*ab$"))
      .toDF("host", "body")
    val rules = Robots.disallowRules(r, "host", "body")
    val urls = Seq("https://o.example/日本ab", "https://o.example/otherab")
      .toDF("url")
    val got = Robots.disallowedUrls(urls, "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap
    assert(got("https://o.example/日本ab"))    // 7-octet Disallow wins
    assert(!got("https://o.example/otherab")) // only the Allow matches
  }

  test("query string participates in matching") {
    val qr = Seq(("j.example", "User-agent: *\nDisallow: /search?page="))
      .toDF("host", "body")
    val rules = Robots.disallowRules(qr, "host", "body")
    val urls = Seq(
      "https://j.example/search?page=2",  // query matched → blocked
      "https://j.example/search",         // no query → allowed
      "https://j.example/search?page=2#f") // fragment excluded from the path
      .toDF("url")
    val got = Robots.disallowedUrls(urls, "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap
    assert(got("https://j.example/search?page=2"))
    assert(!got("https://j.example/search"))
    assert(got("https://j.example/search?page=2#f"))
  }
}
