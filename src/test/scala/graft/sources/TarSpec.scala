package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** ustar member walk: round trips (plain + gzip), pax/directory
  * stepping, GNU/PAX long-name overrides, multi-member archives,
  * malformed-size termination, and the degrade contract. */
class TarSpec extends AnyFunSuite {

  test("round trip: text member + long-path twin behind a dir + pax header") {
    val texts = Seq("plain words", "unicode 世界 und süß",
      "multi\nline\ttabbed", ("bulk " * 400).trim)
    for (t <- texts; id <- 0L to 9L) { // id % 5 rotates gzip/plain/zstd/xz/bz2
      val f = Tar.syntheticTar(id, t)
      val ms = Tar.parseArchive(f.file_id, f.payload, 1 << 20)
      assert(ms.length == 2, s"id=$id members=${ms.map(_.name)}")
      assert(ms(0).name == s"docs/$id.txt")
      assert(ms(0).text_head == t, s"id=$id")
      assert(ms(0).size == t.getBytes("UTF-8").length.toLong)
      // the second member's >100-char path comes from the GNU 'L'
      // longname (even ids) / PAX path= record (odd ids) — the header
      // field holds only a truncation, so this asserts the override
      assert(ms(1).name == Tar.longPath(id) && ms(1).name.length > 100,
        s"id=$id name=${ms(1).name}")
      assert(ms(1).text_head == t)
    }
  }

  test("terminating zero blocks end the walk (prefix semantics)") {
    // two raw (id % 5 == 1) archives concatenated: the first's zero
    // blocks are the archive end, so only the first's members surface
    val f1 = Tar.syntheticTar(1L, "alpha")
    val f2 = Tar.syntheticTar(6L, "bravo charlie")
    val ms = Tar.parseArchive(9L, f1.payload ++ f2.payload, 1024)
    assert(ms.map(_.text_head) == Seq("alpha", "alpha"))
  }

  test("headBytes bounds retention; size reports the full length") {
    val f = Tar.syntheticTar(1L, "0123456789" * 10)
    val ms = Tar.parseArchive(1L, f.payload, 16)
    assert(ms.head.size == 100L && ms.head.text_head.length == 16)
  }

  test("multi-member archive: all docs recovered in order, all wrappings") {
    val docs = (0L to 7L).map(i => i -> s"document $i body 世界 ${"x" * i.toInt}")
    for (gid <- 0L to 4L) { // gid % 5 rotates gzip/plain/zstd/xz/bz2
      val f = Tar.syntheticTarMulti(gid, docs)
      val ms = Tar.parseArchive(f.file_id, f.payload, 1 << 20)
      assert(ms.length == 8, s"gid=$gid got ${ms.length}")
      assert(ms.map(_.name) == docs.map { case (i, _) => s"docs/$i.txt" })
      assert(ms.map(_.text_head) == docs.map(_._2), s"gid=$gid")
    }
  }

  test("malformed 12-digit octal size terminates (no Int-overflow loop)") {
    // size ~8.6e9: blocks*512 overflows Int; the walk must emit the
    // (truncated) member once and stop — never spin or throw
    val h = new Array[Byte](512 * 3)
    "big.txt".getBytes("US-ASCII").copyToArray(h, 0)
    "77777777777\u0000".getBytes("US-ASCII").copyToArray(h, 124)
    h(156) = '0'
    val ms = Tar.parseArchive(1L, h, 1024)
    assert(ms.length == 1 && ms.head.size == 8589934591L)
    // and the wrap-to-zero shape (size that makes next <= at) stops too
    val h2 = h.clone()
    "77777777000\u0000".getBytes("US-ASCII").copyToArray(h2, 124)
    assert(Tar.parseArchive(1L, h2, 1024).length == 1)
  }

  test("streaming: members past 1 GiB decompressed still surface, O(headBytes) memory") {
    // a 1.25 GiB member (zstd'd zeros, ~KBs compressed) followed by a
    // tail member: the pre-round-19 walk materialized the decompressed
    // archive and silently truncated at 1 GiB, losing the tail; the
    // streaming walk skips the body and surfaces BOTH without ever
    // holding more than headBytes of it
    val bigSize = (1L << 30) + (1L << 28)
    val bos = new java.io.ByteArrayOutputStream(1 << 20)
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(Tar.headerBlock("big.bin", bigSize, '0'))
    val zeros = new Array[Byte](1 << 16)
    var left = ((bigSize + 511L) / 512L) * 512L
    while (left > 0) { val n = math.min(left, zeros.length.toLong).toInt; z.write(zeros, 0, n); left -= n }
    val tail = "tail member after the old cap".getBytes("UTF-8")
    z.write(Tar.headerBlock("docs/tail.txt", tail.length.toLong, '0'))
    z.write(tail); z.write(new Array[Byte](512 - tail.length % 512))
    z.write(new Array[Byte](1024)); z.close()
    val ms = Tar.parseArchive(7L, bos.toByteArray, 64)
    assert(ms.map(_.name) == Seq("big.bin", "docs/tail.txt"))
    assert(ms(0).size == bigSize && ms(0).text_head.length == 64)
    assert(ms(1).text_head == "tail member after the old cap")
  }

  test("GNU 'L'/PAX payload allocation is clamped to MaxNameBytes") {
    // a crafted 'L' entry claiming a 100 MB name must not allocate
    // 100 MB: the walk keeps at most MaxNameBytes (64 KiB) of it
    val claimed = 100L * 1024 * 1024
    val body = new Array[Byte](1 << 17) // only 128 KiB actually present
    java.util.Arrays.fill(body, 'n'.toByte)
    val payload = Tar.headerBlock("././@LongLink", claimed, 'L') ++ body
    val ms = Tar.parseArchive(1L, payload, 1024)
    assert(ms.isEmpty) // truncated before the named member: prefix semantics
  }

  test("fuzz: random payloads, truncations, bit flips never throw") {
    val rnd = new scala.util.Random(145L)
    (0 until 200).foreach { i =>
      Tar.parseArchive(i.toLong, Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte), 1024)
    }
    // bit flips against every outer wrapping (gzip/plain/zstd/xz/bz2):
    // corrupt compressed streams must degrade, never throw
    for (id <- 0L to 4L) {
      val base = Tar.syntheticTar(id, "fuzz base member text")
      (0 until 300).foreach { _ =>
        val m = base.payload.clone()
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
        Tar.parseArchive(id, m, 1024)
      }
      Seq(0, 100, 511, 512, 600, 1024).foreach { n =>
        Tar.parseArchive(id, base.payload.take(n), 1024)
      }
    }
  }
}
