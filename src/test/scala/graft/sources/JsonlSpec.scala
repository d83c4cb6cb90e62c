package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** JSONL shard walk: codec round trips, JSON string escaping, CRLF and
  * blank-line handling, line-length cap, and the degrade contract. */
class JsonlSpec extends AnyFunSuite {

  test("round trip: lines survive all five outer wrappings") {
    val docs = Seq(
      1L -> "plain words",
      2L -> "unicode 世界 und süß",
      3L -> "quotes \" backslash \\ and\nnewline\ttab",
      4L -> "controls \u0001\u001f bell\u0007",
      5L -> ("bulk " * 300).trim)
    for (sid <- 0L to 9L) { // sid % 5 rotates gzip/plain/zstd/xz/bz2
      val f = Jsonl.syntheticShard(sid, docs)
      val ls = Jsonl.parseShard(f.file_id, f.payload)
      assert(ls.length == 5, s"sid=$sid got ${ls.length}")
      assert(ls.map(_.line_idx) == Seq(0L, 1L, 2L, 3L, 4L))
      // every line is valid JSON carrying the exact text back
      ls.zip(docs).foreach { case (l, (id, t)) =>
        assert(l.line == s"""{"id":$id,"text":${Jsonl.jsonStr(t)}}""")
      }
    }
  }

  test("jsonStr escapes exactly what JSON requires, nothing more") {
    assert(Jsonl.jsonStr("a\"b") == "\"a\\\"b\"")
    assert(Jsonl.jsonStr("a\\b") == "\"a\\\\b\"")
    assert(Jsonl.jsonStr("a\nb\tc") == "\"a\\u000ab\\u0009c\"")
    assert(Jsonl.jsonStr("世界") == "\"世界\"") // raw unicode is valid JSON
  }

  test("CRLF lines, blank lines, and a missing final newline all normalize") {
    val raw = "{\"id\":1}\r\n\r\n{\"id\":2}\n\n{\"id\":3}".getBytes("UTF-8")
    val ls = Jsonl.parseShard(7L, raw)
    assert(ls.map(_.line) == Seq("{\"id\":1}", "{\"id\":2}", "{\"id\":3}"))
    assert(ls.map(_.line_idx) == Seq(0L, 1L, 2L))
  }

  test("a line past MaxLineBytes stops the walk with the prefix kept") {
    val good = "{\"id\":1,\"text\":\"ok\"}\n".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(good)
    val chunk = new Array[Byte](1 << 16)
    java.util.Arrays.fill(chunk, 'x'.toByte)
    var written = 0L
    while (written <= Jsonl.MaxLineBytes.toLong + chunk.length) {
      bos.write(chunk); written += chunk.length
    }
    val ls = Jsonl.parseShard(1L, bos.toByteArray)
    assert(ls.map(_.line) == Seq("{\"id\":1,\"text\":\"ok\"}"))
  }

  test("fuzz: random payloads and bit flips over every wrapping never throw") {
    val rnd = new scala.util.Random(150L)
    (0 until 200).foreach { i =>
      Jsonl.parseShard(i.toLong,
        Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte))
    }
    for (sid <- 0L to 4L) {
      val base = Jsonl.syntheticShard(sid, Seq(1L -> "fuzz base line text"))
      (0 until 200).foreach { _ =>
        val m = base.payload.clone()
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
        Jsonl.parseShard(sid, m)
      }
      Seq(0, 3, 10, base.payload.length - 1).foreach { n =>
        Jsonl.parseShard(sid, base.payload.take(n))
      }
    }
  }
}
