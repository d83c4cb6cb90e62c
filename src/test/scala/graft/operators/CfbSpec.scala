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

  test("a reader that ignored fWhichTblStm would read the distractor") {
    // the wrong-name table stream is 16 bytes of 0x5A — not a valid
    // Clx — so the correct text coming back proves the flag dispatch
    val m = Cfb.syntheticDoc(2L, "flag dispatch proof")
    assert(Cfb.decodeDocText(m).text == "flag dispatch proof")
    val m2 = Cfb.syntheticDoc(3L, "other flag value")
    assert(Cfb.decodeDocText(m2).text == "other flag value")
  }

  test("a CFB that is not a Word document reports container=cfb, empty text") {
    val payload = Cfb.buildCfb(Seq("Book" -> Array.fill[Byte](800)(0x42)), 9)
    val got = Cfb.decodeDocText(MediaFile(1L, payload))
    assert(got.container == "cfb" && got.text == "")
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
    val base = Cfb.syntheticDoc(0L, "fuzz base document with some words")
    (0 until 300).foreach { _ =>
      val mutated = base.payload.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      Cfb.decodeDocText(MediaFile(0L, mutated)) // degrade, never throw
    }
    // truncations at every granularity
    Seq(0, 7, 511, 512, 700, base.payload.length / 2).foreach { n =>
      Cfb.decodeDocText(MediaFile(0L, base.payload.take(n)))
    }
  }
}
