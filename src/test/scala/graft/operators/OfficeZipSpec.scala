package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Multimodal.MediaFile

/** DOCX/EPUB zip walk: central-directory parse, stored + deflate
  * member reads, run-concatenation word count, encryption refusal,
  * degradation, fuzz, and distributed ≡ driver. */
class OfficeZipSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fixture payloads parse back to their construction parameters") {
    OfficeFixtures.fixtures.foreach { case (file, expected) =>
      val got = OfficeZip.decodeOffice(file)
      assert(got == expected, s"doc ${file.doc_id}: got $got")
    }
  }

  test("run-split words fuse: 'Alp'+'ha beta gamma' is three words, not four") {
    val (file, expected) = OfficeFixtures.fixtures.head
    assert(expected.n_words == 7L)
    assert(OfficeZip.decodeOffice(file).n_words == 7L)
  }

  test("central directory is authoritative: names and flags visible without decode") {
    val (file, _) = OfficeFixtures.fixtures(4) // the flag-encrypted docx
    val cd = OfficeZip.centralDirectory(file.payload).get
    assert(cd.map(_.name).contains("word/document.xml"))
    val encEntry = cd.find(_.name == "word/document.xml").get
    assert((encEntry.flag & 1) == 1)
    // flagged entries are visible but REFUSED by the reader
    assert(OfficeZip.entryBytes(file.payload, encEntry).isEmpty)
  }

  test("deflated members inflate back to their exact source bytes") {
    val (file, _) = OfficeFixtures.fixtures(1) // all-deflate docx
    val cd = OfficeZip.centralDirectory(file.payload).get
    val doc = cd.find(_.name == "word/document.xml").get
    assert(doc.method == 8 && doc.compSize != doc.uncompSize)
    val bytes = OfficeZip.entryBytes(file.payload, doc).get
    assert(bytes.length.toLong == doc.uncompSize)
    assert(new String(bytes, "UTF-8").contains("the quick brown fox jumps"))
  }

  test("xml entity unescape covers the five predefined entities, amp last") {
    assert(OfficeZip.unescapeXml("&lt;a&gt; &quot;b&quot; &apos;c&apos; &amp;lt;") ==
      "<a> \"b\" 'c' &lt;")
  }

  test("zip64 layout reads byte-exactly: locator -> EOCD record -> extra fields") {
    val z64 = OfficeFixtures.docxZip64
    val got = OfficeZip.decodeOffice(Multimodal.MediaFile(9L, z64))
    assert(got.format == "docx" && got.n_entries == 3L && got.n_words == 7L &&
      got.n_parts == 2L && got.title == "Spec & Doc" && got.language == "en-US")
    // the deflated member inflates through the zip64-resolved offsets
    val text = OfficeZip.decodeOfficeText(Multimodal.MediaFile(9L, z64))
    assert(text.text == "Alpha beta gamma\ndelta epsilon & zeta")
    // bit-flips across the zip64 structures degrade, never throw
    val rnd = new scala.util.Random(127L)
    (0 until 300).foreach { _ =>
      val mutated = z64.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      val r = OfficeZip.decodeOffice(Multimodal.MediaFile(10L, mutated))
      assert(r.n_entries >= 0L && r.n_words >= 0L)
    }
  }

  test("EPUB n_words counts the spine chapters' stripped prose; encrypted stays 0") {
    val byId = OfficeFixtures.fixtures.map { case (f, m) => (f.doc_id, (f, m)) }.toMap
    val (epubFile, epubMeta) = byId(3L)
    assert(epubMeta.n_words == 13L) // 5 + 3 + 5, hand-counted construction-side
    assert(OfficeZip.decodeOffice(epubFile).n_words == 13L)
    val (encFile, encMeta) = byId(4L)
    assert(encMeta.n_words == 0L)
    assert(OfficeZip.decodeOffice(encFile).n_words == 0L)
  }

  test("fuzz: random payloads and mutated fixtures never throw") {
    val rnd = new scala.util.Random(115L)
    (0 until 300).foreach { i =>
      val n = rnd.nextInt(400)
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val got = OfficeZip.decodeOffice(MediaFile(i.toLong, payload))
      assert(got.byte_len == n.toLong)
      if (got.container == "stub")
        assert(got.format == "stub" && !got.encrypted)
    }
    OfficeFixtures.fixtures.foreach { case (file, _) =>
      (0 until 40).foreach { _ =>
        val mutated = file.payload.clone()
        if (mutated.nonEmpty) {
          val at = rnd.nextInt(mutated.length)
          mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
        }
        val got = OfficeZip.decodeOffice(MediaFile(file.doc_id, mutated))
        assert(got.n_words >= 0L && got.n_entries >= 0L)
      }
    }
  }

  test("distributed extractMeta equals the driver decode") {
    val viaSpark = OfficeZip.extractMeta(OfficeFixtures.dataset(spark))
      .collect().sortBy(_.doc_id).toSeq
    assert(viaSpark == OfficeFixtures.fixtures.map(_._2))
  }

  test("text extraction: DOCX paragraphs and EPUB spine chapters, encrypted empty") {
    OfficeFixtures.textFixtures.foreach { case (file, expected) =>
      val got = OfficeZip.decodeOfficeText(file)
      assert(got == expected, s"doc ${file.doc_id}: got $got")
    }
  }

  test("stripXhtml drops script/style, strips tags, decodes entities, collapses ws") {
    assert(OfficeZip.stripXhtml(
      "<html><head><style>p{}</style><script>x&y</script></head>" +
        "<body>\n  <p>one &amp; two</p>\n<div>three</div></body></html>") ==
      "one & two three")
  }

  test("syntheticDocx round-trips arbitrary unicode text through run-split escapes") {
    val rnd = new scala.util.Random(122L)
    val texts = Seq("plain ascii prose", "amp & lt < gt > mixed", "café — déjà vu",
      "日本語テキスト", "", "&&&<<<>>>", "a") ++
      (0 until 100).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "&" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = OfficeZip.decodeOfficeText(OfficeZip.syntheticDocx(i.toLong, t))
      assert(got.text == t, s"round trip broke for case $i: '${t.take(40)}'")
      assert(got.format == "docx")
    }
  }

  test("syntheticEpub round-trips under the collapse-ws invariant") {
    def collapsed(s: String): String =
      "[ \n\t\r]+".r.replaceAllIn(s, " ").trim
    val rnd = new scala.util.Random(124L)
    val texts = Seq("plain prose", "amp & lt < gt >", "  leading and trailing  ",
      "runs   of\t\nwhitespace inside", "café 日本語", "") ++
      (0 until 80).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) " " else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = OfficeZip.decodeOfficeText(OfficeZip.syntheticEpub(i.toLong, t))
      assert(got.format == "epub")
      assert(got.text == collapsed(t),
        s"collapse invariant broke for case $i: '${t.take(40)}'")
    }
  }

  test("distributed extractText equals the driver decode; cascade adapter filters") {
    import spark.implicits._
    val viaSpark = OfficeZip.extractText(OfficeFixtures.dataset(spark))
      .collect().sortBy(_.doc_id).toSeq
    assert(viaSpark == OfficeFixtures.textFixtures.map(_._2))
    // only real document formats with text become cascade documents
    val docs = OfficeZip.asDocuments(OfficeFixtures.dataset(spark))
    assert(docs.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 9L, 10L, 11L, 12L, 13L)) // zip64 docx, xlsx, pptx, odt, tab/br docx
  }

  test("odt line-break element becomes a newline") {
    val content = "<?xml version=\"1.0\"?>" +
      "<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
      "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">" +
      "<office:body><office:text>" +
      "<text:p>first<text:line-break/>second</text:p>" +
      "</office:text></office:body></office:document-content>"
    val got = OfficeZip.decodeOfficeText(Multimodal.MediaFile(1L,
      OfficeFixtures.buildSyntheticOdt(content, deflate = false)))
    assert(got.text == "first\nsecond")
  }

  test("syntheticXlsx round-trips arbitrary unicode through the rels+sst chain") {
    val rnd = new scala.util.Random(131L)
    val texts = Seq("plain cell text", "amp & lt < gt > mixed", "café — déjà vu",
      "日本語テキスト", "", "tab\there and\nnewline", "&&&<<<>>>") ++
      (0 until 80).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "&" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = OfficeZip.decodeOfficeText(OfficeZip.syntheticXlsx(i.toLong, t))
      assert(got.text == t, s"xlsx round trip broke for case $i: '${t.take(40)}'")
      assert(got.format == "xlsx")
    }
  }

  test("syntheticPptx round-trips arbitrary unicode through the sldId rels chain") {
    val rnd = new scala.util.Random(132L)
    val texts = Seq("slide prose", "amp & lt < gt >", "café 日本語", "",
      "a", "runs   of whitespace") ++
      (0 until 80).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "<" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = OfficeZip.decodeOfficeText(OfficeZip.syntheticPptx(i.toLong, t))
      assert(got.text == t, s"pptx round trip broke for case $i: '${t.take(40)}'")
      assert(got.format == "pptx")
    }
  }

  test("xlsx sheets follow WORKBOOK order via rels, not filename order") {
    // fixture 10 lists Beta(sheet2) before Alpha(sheet1): sheet2's rows
    // must come first — numeric-filename order would invert the text
    val xl = OfficeFixtures.fixtures(9)._1
    val got = OfficeZip.decodeOfficeText(xl)
    assert(got.text == "quarterly revenue\t42\ninline note\nnet income & tax")
    assert(got.text.indexOf("quarterly") < got.text.indexOf("net income"))
  }

  test("pptx slides follow PRESENTATION order via rels") {
    val pp = OfficeFixtures.fixtures(10)._1
    val got = OfficeZip.decodeOfficeText(pp)
    assert(got.text == "opening remarks\nclosing & thanks\nfin")
  }

  test("odt paragraphs: spans concatenate, tab/space elements substitute") {
    val od = OfficeFixtures.fixtures(11)._1
    val got = OfficeZip.decodeOfficeText(od)
    assert(got.format == "odt")
    assert(got.text == "Annual Report\nLibreOffice prose\twith & spaced words")
  }

  test("syntheticOdt round-trips arbitrary unicode through span splits") {
    val rnd = new scala.util.Random(134L)
    val texts = Seq("plain odt prose", "amp & lt < gt > mixed", "café — déjà vu",
      "日本語テキスト", "", "tab\there", "&&&<<<>>>") ++
      (0 until 80).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "&" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = OfficeZip.decodeOfficeText(OfficeZip.syntheticOdt(i.toLong, t))
      assert(got.text == t, s"odt round trip broke for case $i: '${t.take(40)}'")
      assert(got.format == "odt")
    }
  }
}
