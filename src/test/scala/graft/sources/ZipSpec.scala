package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OfficeFixtures

/** Generic zip member walk (the l147 surface): stored/deflate round
  * trips, encryption-flag refusal, directory skipping, zip64, bounded
  * retention, and the degrade contract. */
class ZipSpec extends AnyFunSuite {

  test("round trip: stored + deflate + flagged members, dir skipped") {
    val texts = Seq("plain words", "unicode 世界 und süß",
      "multi\nline\ttabbed", ("bulk " * 400).trim)
    for (t <- texts; id <- 0L to 4L) { // id 0 and 4 take the zip64 layout
      val ms = Zip.parseArchive(id, OfficeFixtures.buildSyntheticArchiveZip(id, t), 1 << 20)
      assert(ms.map(_.name) ==
        Seq(s"docs/$id.txt", s"docs/$id.z.txt", s"docs/$id.locked.txt"), s"id=$id")
      assert(ms.map(_.member_idx) == Seq(0L, 1L, 2L))
      assert(ms(0).text_head == t && ms(1).text_head == t, s"id=$id")
      assert(ms(2).text_head == "") // flagged: visible, not readable
      assert(ms.forall(_.size == t.getBytes("UTF-8").length.toLong))
      assert(ms(0).method == 0L && ms(1).method == 8L)
    }
  }

  test("headBytes bounds retention; size reports the full length") {
    val ms = Zip.parseArchive(1L,
      OfficeFixtures.buildSyntheticArchiveZip(1L, "0123456789" * 10), 16)
    assert(ms.head.size == 100L && ms.head.text_head.length == 16)
  }

  test("fuzz: random payloads, truncations, bit flips never throw") {
    val rnd = new scala.util.Random(147L)
    (0 until 200).foreach { i =>
      Zip.parseArchive(i.toLong,
        Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte), 1024)
    }
    val base = OfficeFixtures.buildSyntheticArchiveZip(1L, "fuzz base member text")
    (0 until 300).foreach { _ =>
      val m = base.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Zip.parseArchive(1L, m, 1024)
    }
    Seq(0, 10, 100, base.length / 2, base.length - 3).foreach { n =>
      Zip.parseArchive(1L, base.take(n), 1024)
    }
  }
}
