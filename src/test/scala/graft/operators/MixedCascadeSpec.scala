package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.functions.TextFunctions.{htmlToText, normalizeText}
import graft.sources.Warc

/** The l130 composition claim in miniature: the SAME prose shipped as a
  * gzipped WARC-wrapped HTML response, a constructed PDF, and
  * constructed DOCX/EPUB/XLSX/PPTX/ODT containers must extract and
  * NORMALIZE to one identical string,
  * so the exact-dedup stage collapses the cross-container copies — and
  * distinct prose must survive. Per-family round trips are certified by
  * l50/l66, l121, l122, l124, l131, l132, l134; this pins that the
  * families converge on
  * the same canonical form ACROSS the container boundary. */
class MixedCascadeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("cross-container duplicates collapse through the mixed cascade") {
    import spark.implicits._
    val prose = "The Quick Brown Fox jumps over the lazy dog — and keeps going!"
    val other = "completely different content about rivers and stones here now"
    val pre = "<html><head><style>p{color:red}</style></head>" +
      "<body><!-- chrome --><p>"
    val post = "</p><script>track();</script></body></html>"
    val htmlDocs = Warc.records(
        spark.createDataset(Seq(
          Warc.syntheticResponse(10L, "http://x/a", pre + prose + post), // gz (even)
          Warc.syntheticResponse(11L, "http://x/b", pre + other + post))), // plain
        headBytes = 4096).toDF()
      .filter(col("warc_type") === "response" && col("http_status") === 200)
      .select(col("file_id").as("doc_id"), htmlToText(col("body_head")).as("text"))
    val pdfDocs = PdfText.extractText(spark.createDataset(Seq(
        PdfText.syntheticPdf(20L, prose)))).toDF()
      .select(col("doc_id"),
        decode(encode(col("text"), "ISO-8859-1"), "UTF-8").as("text"))
    val docxDocs = OfficeZip.extractText(spark.createDataset(Seq(
        OfficeZip.syntheticDocx(30L, prose),
        OfficeZip.syntheticEpub(40L, prose),
        OfficeZip.syntheticXlsx(50L, prose),
        OfficeZip.syntheticPptx(60L, prose),
        OfficeZip.syntheticOdt(70L, prose)))).toDF()
      .select(col("doc_id"), col("text"))
    val docs = htmlDocs.unionAll(pdfDocs).unionAll(docxDocs)
      .select(col("doc_id"), normalizeText(col("text")).as("text"))
    // all SEVEN extractions of `prose` are one normalized string
    assert(docs.filter(col("doc_id") =!= 11L)
      .select("text").distinct().count() == 1L)
    // the cascade keeps the smallest id per duplicate class + the distinct doc
    val kept = Dedup.dedupCorpus(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 11L), s"kept $kept")
  }
}
