package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** 7z member walk: per-coder round trips, directory skip, the
  * listed-vs-readable split on password-protected members, headBytes
  * retention, and the degrade contract. */
class SevenZSpec extends AnyFunSuite {

  test("round trip: LZMA2 + COPY + BZIP2 members behind a skipped directory") {
    val texts = Seq("plain words", "unicode 世界 und süß",
      "multi\nline\ttabbed", ("bulk " * 400).trim)
    for ((t, i) <- texts.zipWithIndex) {
      val id = i.toLong
      val f = SevenZ.synthetic7z(id, t)
      val ms = SevenZ.parseArchive(f.file_id, f.payload, 1 << 20)
      assert(ms.length == 3, s"id=$id members=${ms.map(_.name)}")
      assert(ms.map(_.name) == Seq(s"docs/$id.txt", s"docs/$id.c.txt", s"docs/$id.b.txt"))
      assert(ms.forall(_.text_head == t), s"id=$id")
      assert(ms.forall(_.size == t.getBytes("UTF-8").length.toLong))
      assert(ms.map(_.member_idx) == Seq(0L, 1L, 2L))
    }
  }

  test("headBytes bounds retention; size reports the full length") {
    val f = SevenZ.synthetic7z(1L, "0123456789" * 10)
    val ms = SevenZ.parseArchive(1L, f.payload, 16)
    assert(ms.head.size == 100L && ms.head.text_head.length == 16)
  }

  test("password-protected members list with empty heads (listed != readable)") {
    val enc = SevenZ.syntheticEncrypted7z(5L, "secret body", "hunter2")
    val ms = SevenZ.parseArchive(5L, enc, 1 << 20)
    assert(ms.map(_.name) == Seq("docs/5.locked.txt"))
    assert(ms.head.text_head == "")
    assert(ms.head.size == "secret body".length.toLong)
  }

  test("fuzz: random payloads, truncations, bit flips never throw") {
    val rnd = new scala.util.Random(151L)
    (0 until 200).foreach { i =>
      SevenZ.parseArchive(i.toLong,
        Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte), 1024)
    }
    val base = SevenZ.synthetic7z(2L, "fuzz base member text")
    (0 until 300).foreach { _ =>
      val m = base.payload.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      SevenZ.parseArchive(2L, m, 1024)
    }
    Seq(0, 10, 31, 32, 100, base.payload.length - 1).foreach { n =>
      SevenZ.parseArchive(2L, base.payload.take(n), 1024)
    }
  }
}
