package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic legacy-encoding fixtures for the l77 charset-sniff
 * oracle, on the l48/l50 ground-truth pattern: each WARC record body
 * is BUILT by encoding a known string under a known charset (plus BOM
 * and label variations), and the DuckDB oracle is a VALUES relation of
 * the ORIGINAL strings — so a match proves the sniff picked the right
 * encoding and the decode recovered the intended text byte-for-byte.
 * Covers every branch of [[Warc.sniffCharset]]'s priority order:
 * UTF-8/16LE/16BE BOMs, an HTTP Content-Type label, a meta-charset
 * label, bare UTF-8 by validity, and the windows-1252 fallback for
 * legacy bytes (the Common Crawl reality this step exists for).
 */
object CharsetFixtures {

  import WarcFixtures.{record, crlf}

  private def cs(name: String) = java.nio.charset.Charset.forName(name)

  private def httpBytes(status: String, contentType: String,
                        body: Array[Byte]): Array[Byte] =
    crlf(s"HTTP/1.1 $status", s"Content-Type: $contentType", "")
      .getBytes("UTF-8") ++ body

  /** (uri slug, content type, body bytes, intended text, expected charset). */
  private lazy val cases: Seq[(String, String, Array[Byte], String, String)] = {
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    val bomLe = Array(0xFF, 0xFE).map(_.toByte)
    val bomBe = Array(0xFE, 0xFF).map(_.toByte)
    Seq(
      // bare UTF-8, no label, no BOM -> structural validity
      ("plain-utf8", "text/html",
        "café résumé naïve".getBytes("UTF-8"),
        "café résumé naïve", "utf-8"),
      // legacy bytes, no label: 0xE9/0x93/0x94/0x96 are invalid UTF-8 ->
      // the WHATWG windows-1252 fallback (curly quotes and the dash sit
      // in cp1252's 0x80-0x9F range, UNDEFINED in ISO-8859-1 proper)
      ("legacy-cp1252", "text/html",
        "café “quoted” dash –".getBytes(cs("windows-1252")),
        "café “quoted” dash –", "windows-1252"),
      // label in the HTTP header wins over content
      ("declared-latin1", "text/html; charset=ISO-8859-1",
        "déjà vu".getBytes(cs("ISO-8859-1")),
        "déjà vu", "windows-1252"),
      // label in a <meta charset=...> inside the body
      ("meta-cp1252", "text/html",
        ("<html><head><meta charset=\"windows-1252\"></head>" +
          "<body>naïve</body></html>").getBytes(cs("windows-1252")),
        "<html><head><meta charset=\"windows-1252\"></head>" +
          "<body>naïve</body></html>", "windows-1252"),
      // BOMs outrank everything; the BOM itself never reaches the text
      ("bom-utf8", "text/html",
        bom8 ++ "bom utf8 ü".getBytes("UTF-8"),
        "bom utf8 ü", "utf-8"),
      ("bom-utf16le", "text/html",
        bomLe ++ "wide text é".getBytes(cs("UTF-16LE")),
        "wide text é", "utf-16le"),
      ("bom-utf16be", "text/html",
        bomBe ++ "big endian é".getBytes(cs("UTF-16BE")),
        "big endian é", "utf-16be"),
      // a page that merely MENTIONS a charset label in prose (no <meta>
      // tag, no HTTP label): the WHATWG prescan only honors labels
      // inside a meta tag, so UTF-8 validity decides — trusting the
      // prose mention would mojibake the é
      ("prose-mention", "text/html",
        "<p>configure charset=iso-8859-1 in your café server</p>".getBytes("UTF-8"),
        "<p>configure charset=iso-8859-1 in your café server</p>", "utf-8"),
      // a <meta charset=...> PAST the 1024-byte prescan window is
      // ignored (WHATWG bounds the scan); UTF-8 validity decides. The
      // expected text is the 256-byte head cut (l77 reads headBytes =
      // 256): "café start " is 12 BYTES (é is 2), the ASCII padding
      // fills the remaining 244 — the cut never lands inside a
      // multibyte char
      ("meta-too-late", "text/html",
        ("café start " + "pad padding text " * 70 +
          "<meta charset=\"iso-8859-1\">").getBytes("UTF-8"),
        "café start " + ("pad padding text " * 70).take(244), "utf-8"))
  }

  lazy val file: WarcFile = WarcFile(7L,
    cases.map { case (slug, ct, body, _, _) =>
      record("response", Some(s"http://enc.example/$slug"),
        httpBytes("200 OK", ct, body))
    }.reduce(_ ++ _))

  def dataset(spark: SparkSession): Dataset[WarcFile] = {
    import spark.implicits._
    spark.createDataset(Seq(file))
  }

  /** The l77 DuckDB oracle: VALUES of the construction-side strings. */
  def oracleSql: String = {
    val rows = cases.zipWithIndex.map { case ((_, _, body, text, charset), i) =>
      val esc = text.replace("'", "''")
      s"(CAST(7 AS BIGINT), CAST($i AS BIGINT), CAST(200 AS BIGINT), " +
        s"CAST(${body.length} AS BIGINT), '$esc', '$charset')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(file_id, rec_idx, http_status, " +
      "body_len, body_head, charset) ORDER BY rec_idx"
  }
}
