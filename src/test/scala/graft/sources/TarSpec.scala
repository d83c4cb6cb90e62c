package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ustar member walk: round trips (plain + gzip), pax/directory
  * stepping, multi-member archives, and the degrade contract. */
class TarSpec extends AnyFunSuite {

  test("round trip: one text member behind a dir + pax header, both wrappings") {
    val texts = Seq("plain words", "unicode 世界 und süß",
      "multi\nline\ttabbed", ("bulk " * 400).trim)
    for (t <- texts; id <- 0L to 3L) {
      val f = Tar.syntheticTar(id, t)
      val ms = Tar.parseArchive(f.file_id, f.payload, 1 << 20)
      assert(ms.length == 1, s"id=$id members=${ms.map(_.name)}")
      assert(ms.head.name == s"docs/$id.txt")
      assert(ms.head.text_head == t, s"id=$id")
      assert(ms.head.size == t.getBytes("UTF-8").length.toLong)
    }
  }

  test("terminating zero blocks end the walk (prefix semantics)") {
    // two raw (odd-id) archives concatenated: the first's zero blocks
    // are the archive end, so only the first's member surfaces
    val f1 = Tar.syntheticTar(1L, "alpha")
    val f2 = Tar.syntheticTar(3L, "bravo charlie")
    val ms = Tar.parseArchive(9L, f1.payload ++ f2.payload, 1024)
    assert(ms.map(_.text_head) == Seq("alpha"))
  }

  test("headBytes bounds retention; size reports the full length") {
    val f = Tar.syntheticTar(1L, "0123456789" * 10)
    val ms = Tar.parseArchive(1L, f.payload, 16)
    assert(ms.head.size == 100L && ms.head.text_head.length == 16)
  }

  test("fuzz: random payloads, truncations, bit flips never throw") {
    val rnd = new scala.util.Random(145L)
    (0 until 200).foreach { i =>
      Tar.parseArchive(i.toLong, Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte), 1024)
    }
    val base = Tar.syntheticTar(1L, "fuzz base member text")
    (0 until 300).foreach { _ =>
      val m = base.payload.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      Tar.parseArchive(1L, m, 1024)
    }
    Seq(0, 100, 511, 512, 600, 1024).foreach { n =>
      Tar.parseArchive(1L, base.payload.take(n), 1024)
    }
  }
}
