package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Multimodal.MediaFile

/** PDF text extraction: page-tree order, FlateDecode round trip,
  * string escapes, encrypted/malformed degradation, fuzz, and the
  * l68-cascade composition (the "optional PDF ingest stage"). */
class PdfTextSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fixture payloads extract exactly their construction-side text") {
    PdfFixtures.textFixtures.foreach { case (file, expected) =>
      val got = PdfText.decodePdfText(file)
      assert(got == expected, s"doc ${file.doc_id}: got $got")
    }
  }

  test("nested page tree: intermediate Pages nodes walk in Kids order") {
    // root Pages(2) -> [node 7, page 3]; node 7 -> [page 5]; so the
    // reading order is page 5's text, then page 3's
    val body = ("%PDF-1.6\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [7 0 R 3 0 R] /Count 2 >>\nendobj\n" +
      "7 0 obj\n<< /Type /Pages /Parent 2 0 R /Kids [5 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Length 17 >>\nstream\nBT (LATER) Tj ET\nendstream\nendobj\n" +
      "5 0 obj\n<< /Type /Page /Parent 7 0 R /Contents 6 0 R >>\nendobj\n" +
      "6 0 obj\n<< /Length 17 >>\nstream\nBT (FIRST) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val got = PdfText.decodePdfText(MediaFile(1L, body))
    assert(got.text == "FIRST\nLATER" && got.n_pages == 2L)
  }

  test("a page with a /Contents ARRAY concatenates its streams in order") {
    val body = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Contents [4 0 R 5 0 R] >>\nendobj\n" +
      "4 0 obj\n<< /Length 15 >>\nstream\nBT (one) Tj ET\nendstream\nendobj\n" +
      "5 0 obj\n<< /Length 15 >>\nstream\nBT (two) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "one\ntwo")
  }

  test("missing /Length falls back to the endstream keyword scan") {
    val body = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< >>\nstream\nBT (unbounded) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "unbounded")
  }

  test("backslash-EOL line continuation joins without a break") {
    val body = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n" +
      "4 0 obj\n<< /Length 25 >>\nstream\nBT (conti\\\nnued) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "continued")
  }

  test("ET/BT inside shown strings neither end nor open text blocks") {
    def onePage(content: String): Array[Byte] =
      ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< >>\nstream\n$content\nendstream\nendobj\n" +
        "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    // 'ET' inside "RETURN" and "BETWEEN" must not truncate the block
    val got = PdfText.decodePdfText(MediaFile(1L,
      onePage("BT (RETURN VALUE) Tj ( BETWEEN BT AND ET) Tj ET")))
    assert(got.text == "RETURN VALUE BETWEEN BT AND ET", s"got '${got.text}'")
    // strings OUTSIDE any BT…ET block contribute nothing
    val outside = PdfText.decodePdfText(MediaFile(2L,
      onePage("(nope) Tj BT (yes) Tj ET (also nope) Tj")))
    assert(outside.text == "yes")
  }

  test("'%' comments: a '(' inside a comment cannot swallow the stream") {
    val content = "BT (shown) Tj % draft note :(\n(more text) Tj ET"
    val body = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val got = PdfText.decodePdfText(MediaFile(1L, body))
    assert(got.text == "shownmore text", s"got '${got.text}'")
  }

  test("contentless pages do not fall back to scanning unrelated streams") {
    // valid tree, one blank page (no /Contents), plus a binary-ish
    // stream containing text-lookalike bytes: extraction must be ""
    val body = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "5 0 obj\n<< /Length 22 >>\nstream\nBT (font junk) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "")
  }

  test("filter chains decode in listed order; unknown filters yield no text") {
    def withFilter(filter: String, data: String): Array[Byte] =
      ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${data.length} $filter >>\nstream\n$data\nendstream\nendobj\n" +
        "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val src = "BT (arrayed) Tj ET"
    // [/FlateDecode /ASCIIHexDecode]: data was hex-armored FIRST, then
    // deflated — decode inflates, then hex-decodes
    val chained = PdfText.decodePdfText(MediaFile(1L,
      withFilter("/Filter [/FlateDecode /ASCIIHexDecode]",
        PdfFixtures.deflateStr(PdfFixtures.hexEncode(src)))))
    assert(chained.text == "arrayed", s"got '${chained.text}'")
    // corrupt deflate in a chain degrades to empty, never garbage
    val corrupt = PdfText.decodePdfText(MediaFile(2L,
      withFilter("/Filter [/FlateDecode /ASCIIHexDecode]", "xxxx")))
    assert(corrupt.text == "")
    // a chain containing an UNSUPPORTED filter yields no text
    val dct = PdfText.decodePdfText(MediaFile(3L,
      withFilter("/Filter [/FlateDecode /DCTDecode]",
        PdfFixtures.deflateStr(src))))
    assert(dct.text == "")
    // one-element array form still inflates
    val ok = PdfText.decodePdfText(MediaFile(4L,
      withFilter("/Filter [ /FlateDecode ]", PdfFixtures.deflateStr(src))))
    assert(ok.text == "arrayed")
  }

  test("encrypted documents report empty text, not ciphertext garbage") {
    val (file, expected) = PdfFixtures.textFixtures(3)
    assert(expected.text == "")
    assert(PdfText.decodePdfText(file).text == "")
  }

  test("fuzz: random payloads and mutated fixtures never throw") {
    val rnd = new scala.util.Random(113L)
    (0 until 300).foreach { i =>
      val n = rnd.nextInt(400)
      val payload = Array.fill(n)(rnd.nextInt(256).toByte)
      val got = PdfText.decodePdfText(MediaFile(i.toLong, payload))
      if (got.container == "stub") assert(got.text == "" && got.n_chars == 0L)
    }
    // bit-flip every fixture at 40 random offsets: parse degrades, never throws
    PdfFixtures.textFixtures.foreach { case (file, _) =>
      (0 until 40).foreach { _ =>
        val mutated = file.payload.clone()
        if (mutated.nonEmpty) {
          val at = rnd.nextInt(mutated.length)
          mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
        }
        val got = PdfText.decodePdfText(MediaFile(file.doc_id, mutated))
        assert(got.n_chars == got.text.length.toLong)
      }
    }
  }

  test("distributed extractText equals the driver decode") {
    val viaSpark = PdfText.extractText(PdfFixtures.textDataset(spark))
      .collect().sortBy(_.doc_id).toSeq
    assert(viaSpark == PdfFixtures.textFixtures.map(_._2))
  }

  test("syntheticPdf round-trips arbitrary unicode text byte-exactly") {
    val rnd = new scala.util.Random(121L)
    val texts = Seq("plain ascii", "parens (and (nested)) \\ backslash",
      "café — déjà vu", "日本語 with BT and ET inside", "", "()()\\\\") ++
      (0 until 100).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "(" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = PdfText.decodePdfText(PdfText.syntheticPdf(i.toLong, t))
      val back = new String(got.text.getBytes("ISO-8859-1"), "UTF-8")
      assert(back == t, s"round trip broke for case $i: '${t.take(40)}'")
    }
  }

  test("XRef-encrypt lookalikes inside stream text do not blank extraction") {
    // a document whose TEXT discusses PDF internals: the token sequence
    // lives in a /Length-bounded content stream, outside any object
    // dict, so the per-dict /Type /XRef scan must not flag encryption
    val t = "manual says << /Type /XRef /Encrypt 5 0 R >> marks encryption"
    Seq(true, false).foreach { flate =>
      val id = if (flate) 2L else 1L // even id = Flate in syntheticPdf
      val got = PdfText.decodePdfText(PdfText.syntheticPdf(id, t))
      assert(got.text == t, s"flate=$flate: got '${got.text}'")
    }
  }

  test("syntheticPdfObjStm round-trips arbitrary unicode through the compressed layout") {
    val rnd = new scala.util.Random(125L)
    val texts = Seq("plain ascii", "parens (and (nested)) \\ backslash",
      "café — déjà vu", "日本語 with BT and ET inside", "",
      "text that mentions /Type /ObjStm and /First 42 explicitly") ++
      (0 until 60).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "(" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = PdfText.decodePdfText(PdfText.syntheticPdfObjStm(i.toLong, t))
      val back = new String(got.text.getBytes("ISO-8859-1"), "UTF-8")
      assert(back == t, s"ObjStm round trip broke for case $i: '${t.take(40)}'")
      assert(got.n_pages == 1L)
    }
  }

  test("truncated ObjStm payload degrades (partial or empty text), never throws") {
    // halve the deflate payload but keep its advertised /Length: the
    // capped inflate stops cleanly on the truncation, the header walk
    // expands whatever pairs survive, and extraction yields whatever
    // pages still resolve — possibly none
    val trunc = PdfFixtures.objStmPdf("1.5",
      Seq("BT (SHOULD DEGRADE) Tj ET"), flate = false, truncateObjStm = true)
    val got = PdfText.decodePdfText(MediaFile(9L, trunc))
    assert(got.container == "pdf")
    assert(got.n_chars == got.text.length.toLong)
    // and bit-flips across the WHOLE compressed fixture never throw
    val rnd = new scala.util.Random(126L)
    val base = PdfFixtures.objStmPdf("1.5",
      Seq("BT (FLIP TARGET) Tj ET"), flate = true)
    (0 until 200).foreach { _ =>
      val mutated = base.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      val r = PdfText.decodePdfText(MediaFile(10L, mutated))
      assert(r.n_chars == r.text.length.toLong)
    }
  }

  test("syntheticPdfCmap round-trips arbitrary unicode through a /ToUnicode CMap") {
    val rnd = new scala.util.Random(129L)
    val texts = Seq("plain ascii", "Übergrößen — déjà vu", "日本語テキスト",
      "ÿĀ� boundary units", "￾￿ bfchar top codes",
      new String(Character.toChars(0x1D11E)) + " surrogate pair", "",
      "BT and ET and Tf inside the text") ++
      (0 until 80).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "x" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = PdfText.decodePdfText(PdfText.syntheticPdfCmap(i.toLong, t))
      assert(got.text == t, s"CMap round trip broke for case $i: '${t.take(40)}'")
      assert(got.n_pages == 1L)
    }
  }

  test("the CMap decode is non-identity: ignoring it would fail") {
    // unit 'A' (0x41) is written as code 0x43 — raw emission of the
    // code bytes yields "\u0000C", not "A"
    val got = PdfText.decodePdfText(PdfText.syntheticPdfCmap(1L, "A"))
    assert(got.text == "A" && got.text != "\u0000C")
  }

  test("fonts without a usable /ToUnicode fall back to the raw reading") {
    // font object exists but its ToUnicode stream is garbage: codes
    // emit as their raw ISO-8859-1 bytes (degrade, never throw)
    val body = PdfFixtures.cmapPdf("1.6",
      "BT /F1 12 Tf (raw bytes) Tj ET", "not a cmap at all", flate = false)
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "raw bytes")
    // and a Tf naming an unresolvable font keeps the raw reading too
    val body2 = PdfFixtures.cmapPdf("1.6",
      "BT /F9 12 Tf (still raw) Tj ET",
      "1 beginbfchar <41> <0042> endbfchar", flate = false)
    assert(PdfText.decodePdfText(MediaFile(2L, body2)).text == "still raw")
  }

  test("1-byte-code CMaps remap simple-font bytes; uncovered codes pass through") {
    // bfchar 'A'->Z, bfrange a..c -> 1..3 (one-byte codespace); 'x'
    // uncovered stays 'x'
    val cmap = "1 begincodespacerange <00> <FF> endcodespacerange\n" +
      "1 beginbfchar <41> <005A> endbfchar\n" +
      "1 beginbfrange <61> <63> <0031> endbfrange"
    val body = PdfFixtures.cmapPdf("1.5",
      "BT /F1 10 Tf (Aabcx) Tj ET", cmap, flate = true)
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "Z123x")
  }

  test("bfrange ARRAY form maps each code to its listed dst string") {
    val cmap = "1 begincodespacerange <00> <FF> endcodespacerange\n" +
      "1 beginbfrange <41> <43> [<0058> <00590059> <005A>] endbfrange"
    val body = PdfFixtures.cmapPdf("1.5",
      "BT /F1 10 Tf (ABC) Tj ET", cmap, flate = false)
    assert(PdfText.decodePdfText(MediaFile(1L, body)).text == "XYYZ")
  }

  test("CMap fixtures survive bit-flip fuzz without throwing") {
    val rnd = new scala.util.Random(229L)
    val base = PdfText.syntheticPdfCmap(2L, "fuzz target – ünïcode ツ").payload
    (0 until 200).foreach { _ =>
      val mutated = base.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      val r = PdfText.decodePdfText(MediaFile(3L, mutated))
      assert(r.n_chars == r.text.length.toLong)
    }
  }

  test("ascii85/asciihex decode known vectors and reject corrupt armor") {
    // vectors cross-checked against python base64.a85encode at pin time
    assert(PdfText.ascii85Decode("9jqo^~>").contains("Man "))
    assert(PdfText.ascii85Decode("F*2M7/c~>").contains("sure."))
    assert(PdfText.ascii85Decode("z@:B~>").contains("\u0000\u0000\u0000\u0000ab"))
    assert(PdfText.ascii85Decode("BP@~>").contains("hi"))
    assert(PdfText.ascii85Decode(" 9 j q o ^ ~>").contains("Man ")) // ws ignored
    assert(PdfText.ascii85Decode("9jqoÿ~>").isEmpty) // out-of-range char
    assert(PdfText.ascii85Decode("B~>").isEmpty) // lone trailing char
    assert(PdfText.asciiHexDecode("48 65 6C6C 6F>") == "Hello")
    assert(PdfText.asciiHexDecode("48656C6C6F7>") == "Hellop") // odd pads 0
    // RunLengthDecode: literal run, 257-n repeat, EOD, truncation degrade
    assert(PdfText.runLengthDecode("\u0002abc" + 128.toChar) == "abc")
    assert(PdfText.runLengthDecode((257 - 5).toChar + "x" + 128.toChar) == "xxxxx")
    assert(PdfText.runLengthDecode("\u0004ab") == "ab") // truncated literal
    val rl = new scala.util.Random(233L)
    (0 until 300).foreach { _ =>
      val raw = (0 until rl.nextInt(500)).map(_ =>
        if (rl.nextBoolean()) 'a' else rl.nextInt(256).toChar).mkString
      assert(PdfText.runLengthDecode(PdfFixtures.rleEncode(raw)) == raw,
        s"rle broke at length ${raw.length}")
    }
    // round trip through the construction encoders for random bytes
    val rnd = new scala.util.Random(133L)
    (0 until 200).foreach { _ =>
      val raw = (0 until rnd.nextInt(60)).map(_ => rnd.nextInt(256).toChar).mkString
      assert(PdfText.ascii85Decode(PdfFixtures.a85Encode(raw)).contains(raw))
      assert(PdfText.asciiHexDecode(PdfFixtures.hexEncode(raw)) == raw)
    }
  }

  test("syntheticPdfFiltered round-trips all four filter-chain shapes") {
    val rnd = new scala.util.Random(233L)
    val texts = Seq("plain ascii", "parens (and (nested)) \\ backslash",
      "café — déjà vu", "日本語 with BT and ET inside", "") ++
      (0 until 60).map { _ =>
        (0 until rnd.nextInt(40)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "(" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = PdfText.decodePdfText(PdfText.syntheticPdfFiltered(i.toLong, t))
      val back = new String(got.text.getBytes("ISO-8859-1"), "UTF-8")
      assert(back == t, s"filter chain ${i % 4} broke for case $i: '${t.take(40)}'")
    }
    // unknown filters in a chain still yield no text, never garbage
    val dct = PdfFixtures.filteredPdf("1.4", "ÿØÿ junk",
      "/Filter [/DCTDecode]")
    assert(PdfText.decodePdfText(MediaFile(1L, dct)).text == "")
    // bit-flip fuzz across all three shapes never throws
    (0 until 4).foreach { shape =>
      val base = PdfText.syntheticPdfFiltered(shape.toLong, "flip target – ünïcode").payload
      (0 until 120).foreach { _ =>
        val mutated = base.clone()
        val at = rnd.nextInt(mutated.length)
        mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
        val r = PdfText.decodePdfText(MediaFile(9L, mutated))
        assert(r.n_chars == r.text.length.toLong)
      }
    }
  }

  test("named base encoding: WinAnsi bare name + base-under-Differences (l146)") {
    val texts = Seq("plain ascii only", "smart \u201cquotes\u201d \u2013 and \u2014 \u20acuro\u2122",
      "mixed \u4e16\u754c with latin-1 caf\u00e9 \u00f1", "\u0192\u0160\u017d\u0178 \u0153\u017e \u2030\u2039\u203a")
    val winAnsiImage = PdfText.WinAnsiHigh.values.map(_.codePointAt(0)).toSet
    for (t <- texts; id <- 0L to 7L) {
      val got = PdfText.decodePdfText(PdfText.syntheticPdfBaseEnc(id, t)).text
      val projected = t.codePoints().toArray.map { cp =>
        if (cp < 0x80 || (cp >= 0xA0 && cp <= 0xFF) || winAnsiImage(cp))
          new String(Character.toChars(cp))
        else "?"
      }.mkString
      assert(got == projected + "\n" + PdfText.WinAnsiProbe, s"id=$id t='$t'")
    }
    // the table is exactly cp1252's 27 defined high positions
    assert(PdfText.WinAnsiHigh.size == 27 && PdfText.WinAnsiProbe.length == 27)
    assert(PdfText.WinAnsiHigh(0x80) == "\u20ac" && PdfText.WinAnsiHigh(0x97) == "\u2014")
    Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D).foreach(b => assert(!PdfText.WinAnsiHigh.contains(b)))
  }

  test("ignoring a named base encoding fails visibly (C1 controls)") {
    // same content bytes, /Encoding name the reader does NOT know:
    // the probe line keeps its raw 0x80-0x9F reading — visibly
    // different from every WinAnsi-decoded extraction
    val raw = new String((0x91 to 0x94).map(_.toChar).toArray) // '' "" as bytes
    val body = PdfFixtures.baseEncPdf("1.4", s"BT /F1 12 Tf ($raw) Tj ET",
      "/SomeUnknownEncoding", flate = false, indirectEnc = false)
    val got = PdfText.decodePdfText(MediaFile(1L, body)).text
    assert(got == raw) // C1 controls, NOT smart quotes
    val win = PdfFixtures.baseEncPdf("1.4", s"BT /F1 12 Tf ($raw) Tj ET",
      "/WinAnsiEncoding", flate = false, indirectEnc = false)
    assert(PdfText.decodePdfText(MediaFile(1L, win)).text == "\u2018\u2019\u201c\u201d")
    // INDIRECT bare-name /Encoding (`6 0 obj /WinAnsiEncoding endobj`,
    // legal per \u00a79.6.5) resolves the same way \u2014 pre-round-19 this fell
    // through to the raw C1 reading
    val ind = PdfFixtures.baseEncPdf("1.4", s"BT /F1 12 Tf ($raw) Tj ET",
      "/WinAnsiEncoding", flate = false, indirectEnc = true)
    assert(PdfText.decodePdfText(MediaFile(1L, ind)).text == "\u2018\u2019\u201c\u201d")
    // and an indirect UNKNOWN name still degrades to the raw reading
    val indUnk = PdfFixtures.baseEncPdf("1.4", s"BT /F1 12 Tf ($raw) Tj ET",
      "/SomeUnknownEncoding", flate = false, indirectEnc = true)
    assert(PdfText.decodePdfText(MediaFile(1L, indUnk)).text == raw)
  }

  test("MacRomanEncoding: full high half, Annex D currency/0xF0 deviations") {
    assert(PdfText.MacRomanHigh(0xDB) == "\u00a4") // Annex D: currency, not post-8.5 euro
    assert(!PdfText.MacRomanHigh.contains(0xF0))    // Apple logo: undefined
    assert(PdfText.MacRomanHigh(0xD2) == "\u201c" && PdfText.MacRomanHigh(0x8E) == "\u00e9")
    val bytes = (0x80 to 0xFF).map(_.toChar).mkString
    val body = PdfFixtures.baseEncPdf("1.4", s"BT /F1 12 Tf ($bytes) Tj ET",
      "/MacRomanEncoding", flate = true, indirectEnc = false)
    val got = PdfText.decodePdfText(MediaFile(2L, body)).text
    val expect = (0x80 to 0xFF).map(b =>
      PdfText.MacRomanHigh.getOrElse(b, b.toChar.toString)).mkString
    assert(got == expect)
  }

  test("extracted PDF text composes into the l68 dedup cascade") {
    import spark.implicits._
    // two PDFs carrying the SAME prose (different versions/layout), one
    // distinct, one encrypted (excluded: no text), one stub (excluded)
    val prose = "BT (the quick brown fox jumps over the lazy dog and keeps going) Tj ET"
    def doc(id: Long, src: String, v: String, enc: Boolean): MediaFile =
      MediaFile(id, PdfFixtures.textPdf(v, Seq(src), flate = id % 2 == 0,
        encrypted = enc, reverseKids = false))
    val files = spark.createDataset(Seq(
      doc(1L, prose, "1.4", enc = false),
      doc(2L, prose, "1.7", enc = false),
      doc(3L, "BT (completely different content about rivers and stones here) Tj ET", "1.5", enc = false),
      doc(4L, prose, "2.0", enc = true),
      MediaFile(5L, "plain bytes, not a pdf".getBytes("UTF-8"))))
    val docs = PdfText.asDocuments(files)
    assert(docs.count() == 3L) // encrypted + stub filtered out
    val kept = Dedup.dedupCorpus(docs, "text", "doc_id")
    val ids = kept.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L)) // exact dup (2) collapses onto the smaller id
  }
}
