package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PDF structural metadata: header version, root page-tree count,
  * /Encrypt detection, %%EOF integrity, stub fallback, and fuzz (no
  * payload may throw — malformed input is data). */
class PdfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fixture payloads parse back to their construction parameters") {
    PdfFixtures.fixtures.foreach { case (file, expected) =>
      assert(Multimodal.decodePdf(file) == expected,
        s"doc ${file.doc_id}: got ${Multimodal.decodePdf(file)}")
    }
  }

  test("n_pages is the LARGEST /Count among Pages dicts (nested page trees)") {
    // a root Pages node (Count 10) above two intermediate nodes
    // (Count 4 and 6): the document total is the root's 10
    val body = ("%PDF-1.6\n" +
      "2 0 obj\n<< /Type /Pages /Kids [5 0 R 6 0 R] /Count 10 >>\nendobj\n" +
      "5 0 obj\n<< /Type /Pages /Parent 2 0 R /Count 4 >>\nendobj\n" +
      "6 0 obj\n<< /Count 6 /Type /Pages /Parent 2 0 R >>\nendobj\n" +
      "%%EOF\n").getBytes("ISO-8859-1")
    val got = Multimodal.decodePdf(Multimodal.MediaFile(1L, body))
    assert(got.n_pages == 10L && got.version == "1.6" && got.has_eof)
  }

  test("order-independent /Count before /Type; /Encrypt flags only in the trailer") {
    val body = ("%PDF-1.3\n" +
      "2 0 obj\n<< /Count 3 /Type /Pages >>\nendobj\n" +
      "trailer\n<< /Root 1 0 R /Encrypt 7 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    val got = Multimodal.decodePdf(Multimodal.MediaFile(1L, body))
    assert(got.n_pages == 3L && got.encrypted)
    // a content-stream MENTION of /Encrypt before the trailer must not flag
    val mention = ("%PDF-1.3\n" +
      "4 0 obj\n<< /Length 20 >>\nstream\nsay /Encrypt here\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    assert(!Multimodal.decodePdf(Multimodal.MediaFile(2L, mention)).encrypted)
  }

  test("/Encrypt outside the trailer's balanced dict does not flag (incremental appendix)") {
    // the token appears AFTER the final trailer dictionary closes —
    // an appended incremental-update body must not read as encryption
    val appendix = ("%PDF-1.4\n" +
      "trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n0\n" +
      "9 0 obj\n<< /Length 16 >>\nstream\nsay /Encrypt here\nendstream\nendobj\n" +
      "%%EOF").getBytes("ISO-8859-1")
    assert(!Multimodal.decodePdf(Multimodal.MediaFile(1L, appendix)).encrypted)
    // inside the balanced dict (even nested) it still flags
    val nested = ("%PDF-1.4\n" +
      "trailer\n<< /Size 4 /Info << /X 1 >> /Encrypt 7 0 R /Root 1 0 R >>\n%%EOF")
      .getBytes("ISO-8859-1")
    assert(Multimodal.decodePdf(Multimodal.MediaFile(2L, nested)).encrypted)
  }

  test("xref-stream encryption (PDF 1.5+, no 'trailer' keyword) is detected") {
    // the modern layout: no 'trailer' keyword at all, /Encrypt carried
    // in the plaintext /Type /XRef stream dictionary
    val body = ("%PDF-1.6\n" +
      "7 0 obj\n<< /Type /XRef /Size 9 /Root 1 0 R /Encrypt 8 0 R /W [1 2 1] >>\n" +
      "stream\nxxxx\nendstream\nendobj\nstartxref\n9\n%%EOF").getBytes("ISO-8859-1")
    val got = Multimodal.decodePdf(Multimodal.MediaFile(1L, body))
    assert(got.encrypted && got.has_eof && got.container == "pdf")
    // same layout unencrypted must not flag
    val clean = ("%PDF-1.6\n" +
      "7 0 obj\n<< /Type /XRef /Size 9 /Root 1 0 R /W [1 2 1] >>\n" +
      "stream\nxxxx\nendstream\nendobj\nstartxref\n9\n%%EOF").getBytes("ISO-8859-1")
    assert(!Multimodal.decodePdf(Multimodal.MediaFile(2L, clean)).encrypted)
  }

  test("an absurd /Count digit run clamps instead of crashing the decode") {
    val body = ("%PDF-1.4\n" +
      "2 0 obj\n<< /Type /Pages /Count 99999999999999999999999 >>\nendobj\n" +
      "%%EOF").getBytes("ISO-8859-1")
    val got = Multimodal.decodePdf(Multimodal.MediaFile(1L, body))
    assert(got.container == "pdf" && got.n_pages == 999999999999999999L)
  }

  test("%%EOF counts only within the final 1 KiB (a mid-file marker is not integrity)") {
    val pad = "x" * 2000
    val early = ("%PDF-1.4\n%%EOF\n" + pad).getBytes("ISO-8859-1")
    assert(!Multimodal.decodePdf(Multimodal.MediaFile(1L, early)).has_eof)
    val late = ("%PDF-1.4\n" + pad + "\n%%EOF").getBytes("ISO-8859-1")
    assert(Multimodal.decodePdf(Multimodal.MediaFile(2L, late)).has_eof)
  }

  test("fuzz: 300 random byte payloads decode without throwing, stubs tagged") {
    val rnd = new scala.util.Random(112L)
    (0 until 300).foreach { i =>
      val n = rnd.nextInt(200)
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val got = Multimodal.decodePdf(Multimodal.MediaFile(i.toLong, payload))
      assert(got.byte_len == n.toLong)
      // random bytes essentially never start with %PDF-x.y; when they
      // do not, the stub contract must hold exactly
      if (got.container == "stub")
        assert(got.n_pages == 1L + n % 9 && !got.encrypted && !got.has_eof)
    }
  }

  test("distributed extractMetaPdf equals the driver decode") {
    import spark.implicits._
    val viaSpark = Multimodal.extractMetaPdf(PdfFixtures.dataset(spark))
      .collect().sortBy(_.doc_id).toSeq
    assert(viaSpark == PdfFixtures.fixtures.map(_._2))
  }
}
