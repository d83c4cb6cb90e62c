package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import Multimodal.{MediaFile, PdfMeta}

/**
 * Deterministic PDF payloads for the l112 oracle — the l48/l61 fixture
 * discipline, PDF twin: each payload is built byte-exactly from known
 * construction parameters (version, page count, encryption, truncation)
 * and the DuckDB oracle is a VALUES relation of those SAME parameters,
 * so a match proves [[Multimodal.parsePdfMeta]]'s header/page-tree/
 * trailer walk reads back exactly what the construction wrote —
 * independent of the parser under test.
 */
object PdfFixtures {

  /** A minimal structurally-valid PDF: header, catalog, a page tree
    * with `count` kids, per-page objects, trailer (optionally carrying
    * an /Encrypt entry), %%EOF. Object offsets in the xref are fake —
    * the parser walks structure, not the xref — but every token a
    * structural reader needs is in place and correctly ordered. */
  private def pdf(version: String, count: Int, encrypted: Boolean): Array[Byte] = {
    val kids = (0 until count).map(k => s"${3 + k} 0 R").mkString("[", " ", "]")
    val pages = (0 until count).map { k =>
      s"${3 + k} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>\nendobj\n"
    }.mkString
    val enc = if (encrypted) s"\n${3 + count} 0 obj\n<< /Filter /Standard /V 2 >>\nendobj\n" else ""
    val encRef = if (encrypted) s" /Encrypt ${3 + count} 0 R" else ""
    val body =
      s"%PDF-$version\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        s"2 0 obj\n<< /Type /Pages /Kids $kids /Count $count >>\nendobj\n" +
        pages + enc +
        "xref\n0 1\n0000000000 65535 f \n" +
        s"trailer\n<< /Size ${4 + count} /Root 1 0 R$encRef >>\n" +
        "startxref\n0\n%%EOF\n"
    body.getBytes("ISO-8859-1")
  }

  /** Header present, everything after the first object missing — the
    * truncated-download shape (no page tree, no %%EOF). */
  private def truncated(version: String): Array[Byte] =
    s"%PDF-$version\n1 0 obj\n<< /Type /Catalog".getBytes("ISO-8859-1")

  private def textPayload: Array[Byte] =
    "these bytes are prose, not a pdf document".getBytes("UTF-8")

  /** The stub contract restated from its construction arithmetic. */
  private def stubExpected(id: Long, bl: Long): PdfMeta =
    PdfMeta(id, bl, "", 1L + bl % 9L, encrypted = false,
      has_eof = false, container = "stub")

  /** (payload, expected metadata) — expectations from construction
    * parameters, never from the parser under test. */
  lazy val fixtures: Seq[(MediaFile, PdfMeta)] = {
    val single = pdf("1.4", 1, encrypted = false)
    val multi = pdf("1.7", 5, encrypted = false)
    val enc = pdf("2.0", 2, encrypted = true)
    val trunc = truncated("1.5")
    val text = textPayload
    Seq(
      (MediaFile(1L, single),
        PdfMeta(1L, single.length.toLong, "1.4", 1L, encrypted = false,
          has_eof = true, container = "pdf")),
      (MediaFile(2L, multi),
        PdfMeta(2L, multi.length.toLong, "1.7", 5L, encrypted = false,
          has_eof = true, container = "pdf")),
      (MediaFile(3L, enc),
        PdfMeta(3L, enc.length.toLong, "2.0", 2L, encrypted = true,
          has_eof = true, container = "pdf")),
      (MediaFile(4L, trunc),
        PdfMeta(4L, trunc.length.toLong, "1.5", 0L, encrypted = false,
          has_eof = false, container = "pdf")),
      (MediaFile(5L, text), stubExpected(5L, text.length.toLong)))
  }

  /** The l112 input frame. */
  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(fixtures.map(_._1))
  }

  /** The l112 DuckDB oracle: a VALUES relation of the construction-side
    * expectations. */
  def oracleSql: String = {
    val rows = fixtures.map { case (_, m) =>
      s"(CAST(${m.doc_id} AS BIGINT), CAST(${m.byte_len} AS BIGINT), " +
        s"'${m.version}', CAST(${m.n_pages} AS BIGINT), " +
        s"${m.encrypted.toString.toUpperCase}, ${m.has_eof.toString.toUpperCase}, " +
        s"'${m.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, byte_len, version, n_pages, encrypted, has_eof, container) " +
      "ORDER BY doc_id"
  }
}
