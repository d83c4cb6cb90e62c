package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WARC record-walk specs: fixture parity (construction-side ground
  * truth), gzip multi-member transparency, prefix semantics on
  * truncation, and the never-throw fuzz contract. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("parseFile reads back every fixture's construction-side records") {
    WarcFixtures.fixtures.foreach { case (file, expected) =>
      val got = Warc.parseFile(file.file_id, file.payload)
      assert(got == expected, s"file ${file.file_id}")
    }
  }

  test("records() distributes the walk and preserves per-file order keys") {
    val ds = Warc.records(WarcFixtures.dataset(spark))
    val got = ds.collect().sortBy(r => (r.file_id, r.rec_idx)).toSeq
    assert(got == WarcFixtures.fixtures.flatMap(_._2))
  }

  test("a record walk stops at the first malformed record, keeping the prefix") {
    // fixture C is exactly this case: declared Content-Length overruns
    val (file, expected) = WarcFixtures.fixtures(2)
    assert(expected.length == 1)
    assert(Warc.parseFile(file.file_id, file.payload) == expected)
    // corrupt the version line of record 1 in file A: record 0 survives
    val (a, expA) = WarcFixtures.fixtures.head
    val bytes = a.payload.clone()
    val secondRec = indexOfSlice(bytes, "WARC/1.0".getBytes("UTF-8"), 1)
    assert(secondRec > 0)
    bytes(secondRec) = 'X'.toByte
    assert(Warc.parseFile(9L, bytes) == Seq(expA.head.copy(file_id = 9L)))
  }

  test("charset sniff + decode recover latin-1, cp1252, UTF-16 and BOM payloads") {
    // every CharsetFixtures case decodes back to its construction-side
    // string under the expected charset (the l77 oracle in miniature)
    val recs = Warc.parseFile(CharsetFixtures.file.file_id,
      CharsetFixtures.file.payload, headBytes = 256)
    assert(recs.length == 9)
    val bySlug = recs.map(r => r.target_uri.split("/").last -> r).toMap
    assert(bySlug("plain-utf8").charset == "utf-8" &&
      bySlug("plain-utf8").body_head == "café résumé naïve")
    assert(bySlug("legacy-cp1252").charset == "windows-1252" &&
      bySlug("legacy-cp1252").body_head == "café “quoted” dash –")
    assert(bySlug("declared-latin1").charset == "windows-1252" &&
      bySlug("declared-latin1").body_head == "déjà vu")
    assert(bySlug("meta-cp1252").charset == "windows-1252" &&
      bySlug("meta-cp1252").body_head.contains("naïve"))
    assert(bySlug("bom-utf8").charset == "utf-8" &&
      bySlug("bom-utf8").body_head == "bom utf8 ü") // BOM stripped
    assert(bySlug("bom-utf16le").charset == "utf-16le" &&
      bySlug("bom-utf16le").body_head == "wide text é")
    assert(bySlug("bom-utf16be").charset == "utf-16be" &&
      bySlug("bom-utf16be").body_head == "big endian é")
    // prose "charset=" mention (no <meta> tag) must NOT outrank UTF-8
    // validity; a meta tag past the 1024-byte prescan window is ignored
    assert(bySlug("prose-mention").charset == "utf-8" &&
      bySlug("prose-mention").body_head.contains("café"))
    assert(bySlug("meta-too-late").charset == "utf-8" &&
      bySlug("meta-too-late").body_head.startsWith("café start "))
  }

  test("isValidUtf8 rejects overlong forms, surrogates and >U+10FFFF; accepts boundary sequences") {
    def v(bs: Int*) = Warc.isValidUtf8(bs.map(_.toByte).toArray)
    assert(!v(0xE0, 0x80, 0x80))       // overlong NUL
    assert(!v(0xED, 0xA0, 0x80))       // UTF-16 high surrogate
    assert(!v(0xF4, 0x90, 0x80, 0x80)) // > U+10FFFF
    assert(!v(0xF0, 0x80, 0x80, 0x80)) // overlong
    assert(v(0xE0, 0xA0, 0x80))        // U+0800 — smallest legal 3-byte
    assert(v(0xED, 0x9F, 0xBF))        // U+D7FF — just below surrogates
    assert(v(0xEE, 0x80, 0x80))        // U+E000 — just above surrogates
    assert(v(0xF0, 0x90, 0x80, 0x80))  // U+10000 — smallest legal 4-byte
    assert(v(0xF4, 0x8F, 0xBF, 0xBF))  // U+10FFFF — the ceiling
  }

  test("sniff details: unknown labels fall through; prefix-cut UTF-8 stays UTF-8") {
    // unknown charset label is ignored -> content check decides
    assert(Warc.sniffCharset("Content-Type: text/html; charset=klingon-9",
      "plain ascii".getBytes("UTF-8")) == "utf-8")
    assert(Warc.sniffCharset("Content-Type: text/html; charset=klingon-9",
      Array(0xE9, 0x20).map(_.toByte)) == "windows-1252")
    // a multibyte sequence cut at the prefix boundary is UTF-8 evidence
    val cut = "résumé".getBytes("UTF-8").dropRight(1)
    assert(Warc.isValidUtf8(cut))
    // odd trailing byte under UTF-16 is dropped, never garbled
    val odd = Array(0xFF, 0xFE).map(_.toByte) ++
      "ab".getBytes(java.nio.charset.StandardCharsets.UTF_16LE) ++ Array(0x41.toByte)
    assert(Warc.decodeBody(odd, "utf-16le") == "ab")
  }

  test("parseFile never throws on mutated, truncated, or garbage payloads") {
    val rnd = new scala.util.Random(77)
    val seeds = WarcFixtures.fixtures.map(_._1.payload)
    (1 to 400).foreach { i =>
      val payload = rnd.nextInt(4) match {
        case 0 => // random truncation
          val s = seeds(rnd.nextInt(seeds.length))
          s.take(1 + rnd.nextInt(s.length))
        case 1 => // random single-byte mutations
          val s = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until 1 + rnd.nextInt(5)).foreach { _ =>
            s(rnd.nextInt(s.length)) = rnd.nextInt().toByte }
          s
        case 2 => // gzip magic + garbage (broken compressed stream)
          Array(0x1f.toByte, 0x8b.toByte) ++ Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
        case _ => Array.fill(rnd.nextInt(256))(rnd.nextInt().toByte)
      }
      val recs = Warc.parseFile(i.toLong, payload) // must not throw
      recs.foreach { r =>
        assert(r.file_id == i.toLong && r.rec_idx >= 0 && r.content_length >= 0)
      }
    }
  }

  test("WET conversion records round-trip unicode text; warcinfo filtered by type") {
    val rnd = new scala.util.Random(135L)
    val texts = Seq("plain extracted prose", "café — déjà vu", "日本語テキスト",
      "", "WARC/1.0 lookalike inside text", "line\nbreaks\nand\ttabs") ++
      (0 until 60).map { _ =>
        (0 until rnd.nextInt(60)).map { _ =>
          val cp = rnd.nextInt(0x10FFFF + 1)
          if (cp >= 0xD800 && cp <= 0xDFFF) "w" else new String(Character.toChars(cp))
        }.mkString
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      val f = Warc.syntheticWetFile(i.toLong, s"http://x/wet/$i", t)
      val recs = Warc.parseFile(f.file_id, f.payload, headBytes = 8192)
      assert(recs.length == 2, s"case $i: ${recs.length} records")
      assert(recs.head.warc_type == "warcinfo")
      val conv = recs(1)
      assert(conv.warc_type == "conversion")
      assert(conv.body_head == t, s"WET round trip broke for case $i: '${t.take(40)}'")
      assert(conv.charset == "utf-8")
    }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      if ((0 until needle.length).forall(j => hay(i + j) == needle(j))) return i
      i += 1
    }
    -1
  }
}
