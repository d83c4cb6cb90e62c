package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** robots.txt subset parse: user-agent group boundaries, agent/star
  * applicability, empty-Disallow drop, and URL prefix flagging. */
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
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("a.example", "/private/"), // star group applies to graftbot
      ("a.example", "/tmp/"),
      ("b.example", "/ads/")))    // named in the two-agent group; 'other' group not
    // evilbot gets ITS group plus the star group; b.example names
    // neither evilbot nor * in any group, so contributes nothing
    val evil = Robots.disallowRules(robots, "host", "body", agent = "evilbot")
      .as[(String, String)].collect().toSet
    assert(evil == Set(
      ("a.example", "/private/"), ("a.example", "/tmp/"), ("a.example", "/")))
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
}
