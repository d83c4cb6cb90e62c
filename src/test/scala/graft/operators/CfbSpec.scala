package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaFile

/** MS-CFB compound files + the [MS-DOC] piece-table walk: round trips
  * over both sector sizes and both text encodings, the fWhichTblStm
  * dispatch, Prc skipping, mini-vs-FAT stream placement, and the
  * degrade contract. */
class CfbSpec extends AnyFunSuite {

  test("round trip: mixed ASCII/Unicode text over every fixture shape") {
    val texts = Seq(
      "plain ascii words only",
      "unicode 世界 κόσμος мир mixed with ascii runs that are long enough to split",
      "multi\nline\nparagraphs\nwith breaks",
      "emoji 😀 straddles surrogate pairs " + ("x" * 97) + " 🚀 end",
      ("long document " * 400).trim) // > 4096 bytes: FAT-sector placement
    for (t <- texts; id <- 0L to 10L) {
      val m = Cfb.syntheticDoc(id, t)
      val got = Cfb.decodeDocText(m)
      assert(got.container == "doc", s"id=$id")
      assert(got.text == t, s"id=$id text='${got.text.take(80)}'")
    }
  }

  test("fields: codes dropped, results kept, marks and control chars stripped") {
    // the planted HYPERLINK field (syntheticDoc wraps the second half)
    // is covered by every round trip above; here the raw contract —
    // text between begin(13) and sep(14) drops, sep..end(15) keeps,
    // 0x0B is a line break, cell/pic marks vanish
    assert(Cfb.stripFieldsAndControls(
      "a\u0013 HYPERLINK \"http://x\" \u0014shown\u0015b") == "ashownb")
    assert(Cfb.stripFieldsAndControls("l1\u000Bl2") == "l1\nl2")
    assert(Cfb.stripFieldsAndControls("cell\u0007pic\u0001obj\u0008") == "cellpicobj")
    // nested fields: outer code contains an inner field entirely
    assert(Cfb.stripFieldsAndControls(
      "x\u0013 IF \u0013 PAGE \u0014 1\u0015 \u0014result\u0015y") == "xresulty")
  }

  test("a reader that ignored fWhichTblStm would read the distractor") {
    // the wrong-name table stream is 16 bytes of 0x5A — not a valid
    // Clx — so the correct text coming back proves the flag dispatch
    val m = Cfb.syntheticDoc(2L, "flag dispatch proof")
    assert(Cfb.decodeDocText(m).text == "flag dispatch proof")
    val m2 = Cfb.syntheticDoc(3L, "other flag value")
    assert(Cfb.decodeDocText(m2).text == "other flag value")
  }

  test("a CFB that is neither Word nor Excel reports container=cfb, empty text") {
    val payload = Cfb.buildCfb(Seq("Contents" -> Array.fill[Byte](800)(0x42)), 9)
    val got = Cfb.decodeDocText(MediaFile(1L, payload))
    assert(got.container == "cfb" && got.text == "")
  }

  test("xls round trip: both SST encodings, both sector sizes") {
    val texts = Seq(
      "plain ascii cell text",
      "unicode 世界 κόσμος ячейка",
      "tab\tand\nnewline survive inside one cell",
      ("wide " * 120).trim)
    for (t <- texts; id <- 0L to 5L) {
      val got = Cfb.decodeDocText(Cfb.syntheticXls(id, t))
      assert(got.container == "xls", s"id=$id")
      assert(got.text == t, s"id=$id got='${got.text.take(60)}'")
    }
  }

  test("xls: sheets extract in BoundSheet8 tab order, cells tab-join by row") {
    // two worksheets written in REVERSE stream order; tab order (the
    // BoundSheet8 directory) must win — and within a sheet, two cells
    // in one row tab-join while a second row newline-joins
    def sheet(cells: Seq[(Int, Int, Int)]): Array[Byte] =
      Cfb.biffBof(0x0010) ++
        cells.flatMap { case (r, c, i) => Cfb.biffLabelSst(r, c, i) } ++
        Cfb.biffEof
    val sst = Cfb.biffSst(Seq(("first", false), ("second", true),
      ("row2", false), ("tabbed", false)))
    val bofG = Cfb.biffBof(0x0005)
    val bsLen = Cfb.biffBoundSheet(0L, "A").length
    val headerLen = bofG.length + 2 * bsLen + sst.length + Cfb.biffEof.length
    val sheetB = sheet(Seq((0, 0, 2))) // stream-FIRST, tab-SECOND
    val sheetA = sheet(Seq((0, 0, 0), (0, 3, 3), (2, 1, 1))) // tab-FIRST
    val wb = bofG ++
      Cfb.biffBoundSheet((headerLen + sheetB.length).toLong, "A") ++ // tab 1 → sheetA
      Cfb.biffBoundSheet(headerLen.toLong, "B") ++ // tab 2 → sheetB
      sst ++ Cfb.biffEof ++ sheetB ++ sheetA
    val got = Cfb.decodeDocText(MediaFile(1L, Cfb.buildCfb(Seq("Workbook" -> wb), 9)))
    assert(got.text == "first\ttabbed\nsecond\nrow2", s"got='${got.text}'")
  }

  test("xls: SST strings straddle CONTINUE records with a mode flip") {
    // hand-split SST: the string "alphabetagamma" (14 chars) starts
    // compressed in the SST record and continues UTF-16 in a CONTINUE
    // record — the continuation's grbit byte re-selects the mode
    val part1 = {
      val head = new Array[Byte](8 + 3 + 5) // counts + cch/grbit + 5 chars
      Cfb.putU32(head, 0, 1L); Cfb.putU32(head, 4, 1L)
      Cfb.putU16(head, 8, 14); head(10) = 0 // compressed start
      "alpha".zipWithIndex.foreach { case (c, i) => head(11 + i) = c.toByte }
      Cfb.biffRec(0x00FC, head)
    }
    val part2 = {
      val rest = "betagamma".getBytes("UTF-16LE")
      val p = new Array[Byte](1 + rest.length)
      p(0) = 1 // grbit: UTF-16 from here on
      System.arraycopy(rest, 0, p, 1, rest.length)
      Cfb.biffRec(0x003C, p)
    }
    val headerLen = Cfb.biffBof(0x0005).length +
      Cfb.biffBoundSheet(0L, "S").length + part1.length + part2.length +
      Cfb.biffEof.length
    val wb = Cfb.biffBof(0x0005) ++
      Cfb.biffBoundSheet(headerLen.toLong, "S") ++ part1 ++ part2 ++
      Cfb.biffEof ++
      Cfb.biffBof(0x0010) ++ Cfb.biffLabelSst(0, 0, 0) ++ Cfb.biffEof
    val got = Cfb.decodeDocText(MediaFile(1L, Cfb.buildCfb(Seq("Workbook" -> wb), 9)))
    assert(got.text == "alphabetagamma", s"got='${got.text}'")
  }

  test("ppt round trip: both atom encodings, junk sibling atoms skipped") {
    val texts = Seq(
      "slide title and body",
      "unicode スライド κείμενο",
      "para\nbreaks\nsurvive",
      ("bulk " * 200).trim)
    for (t <- texts; id <- 0L to 5L) {
      val got = Cfb.decodeDocText(Cfb.syntheticPpt(id, t))
      assert(got.container == "ppt", s"id=$id")
      assert(got.text == t, s"id=$id got='${got.text.take(60)}'")
    }
  }

  test("ppt: multiple text atoms join with newlines in stream order") {
    val a1 = Cfb.pptRec(0x0000, 0x0FA0, "first".getBytes("UTF-16LE"))
    val a2 = Cfb.pptRec(0x0000, 0x0FA8, "second".map(c => (c & 0xFF).toByte).toArray)
    val inner = Cfb.pptRec(0x000F, 0x0FF0, a2) // nested container
    val doc = Cfb.pptRec(0x000F, 0x03E8, a1 ++ inner)
    val got = Cfb.decodeDocText(MediaFile(1L,
      Cfb.buildCfb(Seq("PowerPoint Document" -> doc), 9)))
    assert(got.text == "first\nsecond", s"got='${got.text}'")
  }

  test("ole metadata: SummaryInformation round trip + dispatch kinds") {
    for (id <- 0L to 6L) {
      val m = Cfb.syntheticDocWithMeta(id, s"body text for $id")
      val meta = Cfb.decodeOleMeta(m)
      assert(meta.kind == "doc")
      assert(meta.title == s"T世${id % 97}", s"title='${meta.title}'")
      assert(meta.author == s"author-${id % 7}")
      assert(meta.created_epoch == 1600000000L + id)
      // the sibling DocumentSummaryInformation set (GKPIDDSI):
      // category via VT_LPSTR, company via VT_LPWSTR (unicode)
      assert(meta.category == s"cat-${id % 5}", s"category='${meta.category}'")
      assert(meta.company == s"C株${id % 13}", s"company='${meta.company}'")
      // the text walk is unaffected by the extra streams
      assert(Cfb.decodeDocText(m).text == s"body text for $id")
    }
    // kinds without a SummaryInformation stream: fields default
    val xls = Cfb.decodeOleMeta(Cfb.syntheticXls(1L, "cells"))
    assert(xls.kind == "xls" && xls.title == "" && xls.created_epoch == 0L)
    assert(xls.category == "" && xls.company == "")
    assert(Cfb.decodeOleMeta(Cfb.syntheticPpt(1L, "slides")).kind == "ppt")
    assert(Cfb.decodeOleMeta(MediaFile(1L, "prose".getBytes("UTF-8"))).kind == "stub")
  }

  test("non-CFB payloads take the stub path") {
    val got = Cfb.decodeDocText(MediaFile(1L, "just prose".getBytes("UTF-8")))
    assert(got.container == "stub" && got.text == "")
  }

  test("v4 (4096-byte sector) containers read back identically") {
    val t = "sector-size-4096 document " + ("y" * 300)
    val m = Cfb.syntheticDoc(5L, t) // docId % 5 == 0 → v4
    assert(new String(m.payload, 28, 2, "ISO-8859-1") != null) // shape built
    assert(Cfb.decodeDocText(m).text == t)
  }

  test("fuzz: random payloads and bit-flipped fixtures never throw") {
    val rnd = new scala.util.Random(137L)
    (0 until 200).foreach { i =>
      val payload = Array.fill(rnd.nextInt(3000))(rnd.nextInt(256).toByte)
      Cfb.decodeDocText(MediaFile(i.toLong, payload))
    }
    Seq(Cfb.syntheticDoc(0L, "fuzz base document with some words"),
        Cfb.syntheticXls(1L, "fuzz base workbook with some cells")).foreach { base =>
      (0 until 300).foreach { _ =>
        val mutated = base.payload.clone()
        val at = rnd.nextInt(mutated.length)
        mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
        Cfb.decodeDocText(MediaFile(0L, mutated)) // degrade, never throw
      }
    }
    val base = Cfb.syntheticDoc(0L, "fuzz base document with some words")
    // truncations at every granularity
    Seq(0, 7, 511, 512, 700, base.payload.length / 2).foreach { n =>
      Cfb.decodeDocText(MediaFile(0L, base.payload.take(n)))
    }
  }
}
