package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic WARC corpus for the l68 end-to-end crawl cascade —
 * the first pipeline a new user builds: WARC bytes → record walk →
 * boilerplate blocks → line dedup → C4 line quality → normalize →
 * exact dedup → near dedup → kept set.
 * l50/l66/l60/l28 certify each stage ALONE; this fixture certifies
 * them COMPOSED, on the l48/l50 ground-truth pattern: the DuckDB
 * oracle is a VALUES relation of the construction-side (doc_id, html)
 * pairs — the exact strings the WARC bytes were built around, never
 * the parser's output — so a match proves byte ingestion, text
 * extraction, normalization and both dedup stages compose identically.
 *
 * Corpus design (36 HTTP-200 documents over 3 files):
 *  - 12 families × 3 HTML variants. A family's three variants carry
 *    the SAME words in structurally different markup (plain tags /
 *    style+script blocks to strip AND a repeated prose block that only
 *    the in-page line-dedup stage collapses / uppercase tags +
 *    entities + comments), so exact dedup fires only BECAUSE
 *    extraction, line dedup and normalization reduce them to one
 *    normal form.
 *  - families 0–7: identical text across variants → 8 exact-dup
 *    groups of 3.
 *  - families 8–11: base text of families 0–3 plus one variant-
 *    specific extra word → 3-gram Jaccard ≈ 10/11 vs the base and
 *    ≈ 10/12 vs each other, all ≥ 0.8 → near-dup candidates for the
 *    banded-MinHash + exact-verify stage.
 *  - distractor records that the cascade must FILTER, not trip over:
 *    a warcinfo, an HTTP 404, a non-HTTP request record, and a
 *    truncated final record (prefix semantics).
 *  - file 2 is gzip multi-member (the real `.warc.gz` layout), so the
 *    cascade crosses the decompression path too.
 */
object CascadeFixtures {

  // 8 unrelated 12-word texts, lowercase a-z words, single-spaced —
  // already normalize-fixed-points, so the html variants alone decide
  // whether extraction reaches the same normal form
  private val bases = Vector(
    "the quick brown fox jumps over the lazy dog by the river",
    "pack my box with five dozen liquor jugs for the long trip",
    "a stitch in time saves nine when the cloth begins to fray",
    "all that glitters is not gold said the old miner at dawn",
    "every good boy deserves fruit after the long practice session",
    "the rain in spain falls mainly on the wide open plain",
    "still waters run deep where the old stone bridge crosses over",
    "many hands make light work when the harvest moon rises early")
  private val extras = Vector("tonight", "quietly", "perhaps")

  /** Slot r (0..35): family r%12, variant r/12. */
  def textOf(r: Int): String = {
    val fam = r % 12
    val v = r / 12
    if (fam < 8) bases(fam) else bases(fam - 8) + " " + extras(v)
  }

  /** Three markup variants that all extract+normalize to textOf(r) —
    * ONLY because the cascade's boilerplate pass removes each variant's
    * DIFFERENT link-dense chrome (nav bar / menu div / link list):
    * under plain htmlToText the variants would keep their distinct
    * boilerplate and never converge, so the dedup outcomes downstream
    * prove mainContent is doing real work inside the composition.
    * Every prose block ends in a '.' (normalization strips it, so the
    * normal forms are unchanged) because the cascade's C4 line-quality
    * stage requires terminal punctuation; variant 2 additionally
    * carries an enable-javascript interstitial that the BOILERPLATE
    * pass keeps (long, link-free, stopword-dense — jusText has no
    * reason to cut it) and only the line-quality stage removes — so
    * exact dedup converges only when THAT stage runs too. */
  def htmlOf(r: Int): String = {
    val t = textOf(r)
    (r / 12) match {
      case 0 => "<html><body><nav><a href=/h>Home</a> <a href=/b>Blog</a> " +
        "<a href=/c>Contact</a></nav>" +
        s"<p>$t.</p><footer>Copyright <a href=/p>privacy</a></footer></body></html>"
      case 1 => s"<html><head><style>p{color:red}</style></head><body>" +
        "<div class=menu><a href=/1>one</a> <a href=/2>two</a> <a href=/3>three</a></div>" +
        // the prose block appears TWICE (the in-page repetition crawl
        // pages actually carry): without the cascade's line-dedup
        // stage this variant would extract to "t t" and never converge
        // with variants 0/2 — lineDedup is load-bearing here
        s"<div>$t.</div><div>$t.</div><script>var x=1;</script></body></html>"
      case _ => "<ul><li><a href=/x>archive</a></li><li><a href=/y>tags</a></li></ul>" +
        // kept by the boilerplate verdicts (long, link-free,
        // stopword-dense), terminal-punctuated and 13 words — ONLY the
        // C4 javascript rule removes it
        "<div>please enable javascript to view the full story and the " +
        "gallery of images.</div>" +
        s"<P>$t &amp;&lt;&gt;.</P><!-- note -->"
    }
  }

  import WarcFixtures.{record, http, gz, crlf}

  private def resp(r: Int): Array[Byte] =
    record("response", Some(s"http://site${r % 5}.example/p/$r"),
      http("200 OK", htmlOf(r)))

  /** The three files plus the construction-side (doc_id, html) pairs
    * for every HTTP-200 record; doc_id = file_id·100 + rec_idx. */
  lazy val (files, expected): (Seq[WarcFile], Seq[(Long, String)]) = {
    val docs = Seq.newBuilder[(Long, String)]
    // file 1 (plain): warcinfo, slots 0..11, then a 404
    val f1 = record("warcinfo", None, "software: graft-cascade".getBytes("UTF-8")) ++
      (0 until 12).map { r => docs += ((100L + 1 + r, htmlOf(r))); resp(r) }
        .reduce(_ ++ _) ++
      record("response", Some("http://site0.example/missing"),
        http("404 Not Found", "<p>gone</p>"))
    // file 2 (gzip multi-member): slots 12..23, then a request record
    val f2 = (12 until 24).map { r => docs += ((200L + (r - 12), htmlOf(r))); gz(resp(r)) }
      .reduce(_ ++ _) ++
      gz(record("request", Some("http://site1.example/p/12"),
        "GET /p/12 HTTP/1.1".getBytes("UTF-8")))
    // file 3 (plain): slots 24..35, then a record whose declared
    // Content-Length overruns the bytes — prefix semantics keep 24..35
    val f3 = (24 until 36).map { r => docs += ((300L + (r - 24), htmlOf(r))); resp(r) }
      .reduce(_ ++ _) ++
      crlf("WARC/1.0", "WARC-Type: response", "Content-Length: 9999", "")
        .getBytes("UTF-8") ++ "short".getBytes("UTF-8")
    (Seq(WarcFile(1L, f1), WarcFile(2L, f2), WarcFile(3L, f3)), docs.result())
  }

  def dataset(spark: SparkSession): Dataset[WarcFile] = {
    import spark.implicits._
    spark.createDataset(files)
  }

  /** The oracle's input relation: VALUES of (doc_id, html). */
  def valuesSql: String =
    "raw(doc_id, html) AS (VALUES " +
      expected.map { case (id, h) =>
        s"(CAST($id AS BIGINT), '${h.replace("'", "''")}')"
      }.mkString(", ") + ")"
}
