package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaFile

/** RTF control-word walk: round trips, destination skipping, the
  * \uN/\ucN fallback contract, escapes, and the degrade path. */
class RtfSpec extends AnyFunSuite {

  private def text(rtf: String): String =
    Rtf.decodeRtfText(MediaFile(1L, rtf.getBytes("ISO-8859-1"))).text

  test("round trip: escapes, paragraphs, unicode, braces") {
    val texts = Seq(
      "plain words only",
      "multi\nline\n\nwith a BLANK line preserved",
      "tabs\tand {braces} and \\backslash",
      "unicode 世界 κόσμος мир café — em–dash",
      "emoji 😀 as surrogate pairs 🚀",
      ("long " * 300).trim)
    for (t <- texts; id <- 0L to 3L) {
      val got = Rtf.decodeRtfText(Rtf.syntheticRtf(id, t))
      assert(got.container == "rtf", s"id=$id")
      assert(got.text == t, s"id=$id got='${got.text.take(80)}'")
    }
  }

  test("destination groups contribute no text") {
    assert(text("{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\info{\\author Bob}}hello}") == "hello")
    assert(text("{\\rtf1{\\*\\generator Acme 9;}visible{\\*\\themedata ff00;} text}") ==
      "visible text")
    // nested groups inside a skipped destination stay skipped
    assert(text("{\\rtf1{\\stylesheet{\\s1 Heading;}{\\s2 Body;}}ok}") == "ok")
  }

  test("\\uN emits the unit and \\ucN fallback chars are skipped") {
    assert(text("{\\rtf1\\uc1 a\\u26085?b}") == "a日b")
    assert(text("{\\rtf1\\uc2 a\\u26085??b}") == "a日b")
    assert(text("{\\rtf1\\uc0 a\\u26085 b}") == "a日b") // uc0: nothing skipped
    // negative = signed 16-bit wrap; consecutive \u pairs (surrogates)
    assert(text("{\\rtf1\\uc1 \\u-10179?\\u-8704?}") == "😀")
    // \'hh counts as ONE fallback char
    assert(text("{\\rtf1\\uc1 a\\u26085\\'3fb}") == "a日b")
    // uc is group-scoped: the override dies with its group
    assert(text("{\\rtf1\\uc1 {\\uc2 \\u26085??}\\u26085?x}") == "日日x")
  }

  test("control symbols and word delimiters") {
    assert(text("{\\rtf1 a\\~b}") == "a b") // non-breaking space
    assert(text("{\\rtf1 one\\par two\\par\\par three}") == "one\ntwo\n\nthree")
    assert(text("{\\rtf1 x\\tab y}") == "x\ty")
    assert(text("{\\rtf1 \\ldblquote q\\rdblquote \\bullet}") == "“q”•")
    // the ONE delimiter space is consumed; a second is content
    assert(text("{\\rtf1\\fs24  padded}") == " padded")
    // raw EOLs in the file are ignorable whitespace
    assert(text("{\\rtf1 split\r\nacross\nlines}") == "splitacrosslines")
  }

  test("non-RTF payloads take the stub path; malformed input degrades") {
    assert(Rtf.decodeRtfText(MediaFile(1L, "plain prose".getBytes("UTF-8")))
      .container == "stub")
    // truncations and bit flips never throw
    val base = Rtf.syntheticRtf(0L, "fuzz base document with ünïcode 日本")
    val rnd = new scala.util.Random(142L)
    (0 until 300).foreach { _ =>
      val mutated = base.payload.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      Rtf.decodeRtfText(MediaFile(0L, mutated))
    }
    Seq(1, 5, 20, base.payload.length / 2).foreach { n =>
      Rtf.decodeRtfText(MediaFile(0L, base.payload.take(n)))
    }
  }
}
