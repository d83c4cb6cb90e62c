package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property certification of the robots surface (the SessionScanProps
  * pattern): randomized robots bodies (groups, agents, Allow/Disallow,
  * wildcards, blank/comment noise) and randomized URLs, decided by an
  * INDEPENDENT driver-side RFC 9309 reference — group selection
  * (named-else-star, merged), longest-match by rule-path octets,
  * equal-length tie to Allow, `*`/trailing-`$` wildcards, path+query
  * matching, bare-host `/`. Any divergence between the distributed
  * parse→compile→argmax chain and the reference fails with the seed
  * case printed.
  *
  * SHARED-CONVENTION BLIND SPOT (stated, not hidden): specificity is
  * the UTF-8 octet length of the rule path AS WRITTEN — `*` and the
  * trailing `$` anchor count one octet each. The reference below
  * deliberately shares that convention (the RFC leaves wildcard
  * specificity unspecified; counting-as-written is the common
  * crawler reading), so these properties certify the ENGINE against
  * the convention, not the convention itself: a divergence from some
  * other reading (e.g. wildcard-stripped lengths, where
  * `Allow: /p` vs `Disallow: /p*` would tie differently) is invisible
  * here by construction. */
class RobotsProps extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // driver-side reference: a direct, readable RFC 9309 implementation
  // sharing NO code with the operator
  // ---------------------------------------------------------------
  private case class Rule(path: String, allow: Boolean)

  private def refParse(body: String, agent: String): Seq[Rule] = {
    // split into groups: runs of consecutive user-agent lines start one
    val lines = body.split("\n").toSeq
    case class Group(agents: Seq[String], rules: Seq[Rule])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = scala.collection.mutable.ArrayBuffer.empty[String]
    var curRules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var inAgents = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups += Group(curAgents.toSeq, curRules.toSeq)
      curAgents = scala.collection.mutable.ArrayBuffer.empty[String]
      curRules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    }
    val ua = "(?i)^\\s*user-agent:\\s*(\\S+)".r
    val dis = "(?i)^\\s*disallow:\\s*(\\S*)".r
    val alw = "(?i)^\\s*allow:\\s*(\\S*)".r
    lines.foreach { line =>
      ua.findFirstMatchIn(line) match {
        case Some(m) =>
          if (!inAgents) flush()
          inAgents = true
          curAgents += m.group(1).toLowerCase
        case None =>
          dis.findFirstMatchIn(line) match {
            case Some(m) =>
              inAgents = false
              if (m.group(1).nonEmpty) curRules += Rule(m.group(1), allow = false)
            case None =>
              alw.findFirstMatchIn(line) match {
                case Some(m) =>
                  inAgents = false
                  if (m.group(1).nonEmpty) curRules += Rule(m.group(1), allow = true)
                case None =>
                  // other lines (comments, sitemap, blanks) end the
                  // user-agent run but belong to the current group
                  inAgents = false
              }
          }
      }
    }
    flush()
    val a = agent.toLowerCase
    val named = groups.filter(_.agents.contains(a))
    val chosen = if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules).toSeq
  }

  private def refMatches(path: String, rule: String): Boolean = {
    val anchored = rule.endsWith("$")
    val body = if (anchored) rule.dropRight(1) else rule
    // walk the rule as literal segments separated by '*'
    val segs = body.split("\\*", -1)
    def find(s: String, from: Int, seg: String): Int = s.indexOf(seg, from)
    var pos = 0
    // first segment must match at the start
    if (!path.startsWith(segs.head)) return false
    pos = segs.head.length
    for (seg <- segs.tail.dropRight(if (segs.length > 1) 1 else 0)) {
      val at = find(path, pos, seg)
      if (at < 0) return false
      pos = at + seg.length
    }
    if (segs.length > 1) {
      val last = segs.last
      if (anchored) {
        // last segment must match at the very end, at or after pos
        path.length - last.length >= pos && path.endsWith(last)
      } else {
        find(path, pos, last) >= 0
      }
    } else {
      !anchored || pos == path.length
    }
  }

  private def refDecide(path: String, rules: Seq[Rule]): Boolean = {
    val matching = rules.filter(r => refMatches(path, r.path))
    if (matching.isEmpty) false
    else {
      // specificity in OCTETS (UTF-8 bytes), per RFC 9309 §2.2.2
      val best = matching.maxBy(r =>
        (r.path.getBytes("UTF-8").length, if (r.allow) 1 else 0))
      !best.allow
    }
  }

  private def refPath(url: String): String = {
    val m = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)".r.findFirstMatchIn(url)
    val raw = m.map(_.group(1)).getOrElse("")
    if (raw.startsWith("/")) raw else "/" + raw
  }

  // ---------------------------------------------------------------
  // generation (deterministic seed — reproducible failures)
  // ---------------------------------------------------------------
  test("400 random (robots, url) cases: distributed decision == driver RFC reference") {
    val rnd = new scala.util.Random(20260815L)
    val agents = Seq("graftbot", "otherbot", "evilbot")
    val segs = Seq("/", "/a/", "/a/b", "/pub/", "/pub/x", "/*.pdf$", "/a*z",
      "/q?p=", "/pub/*.html$", "/x$", "/tmp/")
    val nHosts = 40
    val hosts = (0 until nHosts).map { h =>
      val nGroups = 1 + rnd.nextInt(3)
      val body = (0 until nGroups).map { _ =>
        val nAg = 1 + rnd.nextInt(2)
        val ags = (0 until nAg).map(_ =>
          if (rnd.nextInt(3) == 0) "*" else agents(rnd.nextInt(agents.length)))
        val nRules = 1 + rnd.nextInt(3)
        val rules = (0 until nRules).map { _ =>
          val kind = if (rnd.nextInt(3) == 0) "Allow" else "Disallow"
          val p = if (rnd.nextInt(8) == 0) "" else segs(rnd.nextInt(segs.length))
          s"$kind: $p"
        }
        (ags.map(a => s"User-agent: $a") ++ rules).mkString("\n")
      }.mkString("\n\n") + (if (rnd.nextBoolean()) "\n# note" else "")
      (s"h$h.example", body)
    }
    val paths = Seq("", "/", "/a/b", "/a/bz", "/pub/x.html", "/pub/y.pdf",
      "/file.pdf", "/file.pdfx", "/q?p=1", "/a/deep/z", "/x", "/x$y", "/tmp/t")
    val urls = (0 until 400).map { i =>
      val h = rnd.nextInt(nHosts)
      s"https://h$h.example${paths(rnd.nextInt(paths.length))}" -> h
    }

    val robotsDf = hosts.toDF("host", "body")
    val agent = "graftbot"
    val rules = Robots.disallowRules(robotsDf, "host", "body", agent)
    val got = Robots.disallowedUrls(urls.map(_._1).distinct.toDF("url"),
        "url", rules, "host")
      .select("url", "robots_disallowed").as[(String, Boolean)].collect().toMap

    val refRules = hosts.map { case (h, b) => h -> refParse(b, agent) }.toMap
    urls.map(_._1).distinct.foreach { url =>
      val h = "^https://([^/?#]+)".r.findFirstMatchIn(url).get.group(1)
      val expected = refDecide(refPath(url), refRules(h))
      assert(got(url) == expected,
        s"URL $url (path '${refPath(url)}'): got ${got(url)}, reference $expected;" +
          s" rules=${refRules(h)} body=\n${hosts.toMap.apply(h)}")
    }
  }
}
