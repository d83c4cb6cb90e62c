package graft.operators

import java.nio.charset.StandardCharsets.ISO_8859_1

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import Multimodal.MediaFile

/**
 * PDF TEXT extraction (ISO 32000 content streams) — the PDF twin of
 * `TextFunctions.mainContent`'s HTML→text, and the single most common
 * thing a corpus builder does with a PDF: walk the page tree in order,
 * inflate each page's content stream (FlateDecode via
 * `java.util.zip.Inflater` — the one filter real text streams use),
 * and fold the text-showing operators (`Tj`, `'`, `"`, `TJ`) inside
 * `BT…ET` blocks into a plain string.
 *
 * Extraction contract (deliberately small and stated, so the fixture
 * oracle can restate it from construction parameters):
 *   - `Tj` / `TJ` append their string operand(s); `TJ`'s numeric
 *     kerning elements are ignored (they are glyph-space offsets, not
 *     text).
 *   - `'` and `"` (next-line show) and the line-move operators `Td`,
 *     `TD`, `T*` insert ONE `\n` separator — only when there is
 *     preceding text not already ending in `\n`, so positioning ops
 *     before the first glyph add nothing.
 *   - Pages join under the same single-`\n` rule.
 *   - Literal `(…)` strings honor the spec escapes (`\n \r \t \b \f`,
 *     `\( \) \\`, 1–3 digit octal, backslash–EOL line continuation,
 *     unknown escape = drop the backslash) and balanced unescaped
 *     parens; hex `<…>` strings pair hex digits (odd length pads a
 *     trailing 0). String BYTES decode through the current font's
 *     embedded `/ToUnicode` CMap when one is present (ISO 32000
 *     §9.10.3: the font selected by the last `Tf` whose name resolves
 *     through the page's `/Resources /Font` dict — bfchar entries,
 *     bfrange runs, 1- or 2-byte codes per the codespace); bytes with
 *     no CMap, or codes a CMap does not cover, fall back to the
 *     ISO-8859-1 simple-font reading. This covers the common
 *     subset-embedded CID font. A simple font WITHOUT a /ToUnicode
 *     but WITH an `/Encoding` dictionary carrying `/Differences`
 *     (§9.6.5.1 — remapped or symbolic Type1/TrueType fonts) decodes
 *     each byte through the Differences map (glyph names resolved per
 *     the Adobe Glyph List: the common-name table plus the
 *     `uniXXXX`/`uXXXX` forms); unmapped codes and fonts with neither
 *     mechanism degrade to the raw reading.
 *   - An ENCRYPTED document (l112's gate) first tries [[PdfCrypt]]'s
 *     standard security handler with the EMPTY user password (ISO
 *     32000 §7.6.3 — the owner-locked print-driver/scanner shape every
 *     production extractor opens): if /U authenticates, streams are
 *     decrypted (RC4-40/128 or AES-128-CBC per the dictionary) and the
 *     text walk runs normally (V1–V4 RC4/AES-128 and V5 AES-256 all
 *     covered). A document whose user password is NOT
 *     empty — or a non-Standard/unknown handler —
 *     reports empty text: its streams are ciphertext, and emitting
 *     decode garbage as "text" would poison a corpus. The l112
 *     `encrypted` flag is unchanged either way (the document IS
 *     encrypted; extractability is a separate fact).
 *
 * Degradation, never exceptions (the crawl-scale decode contract): a
 * payload without the `%PDF-` magic takes the stub path; a parseable
 * header with a broken body yields whatever pages resolve (possibly
 * empty text); inflation caps at 64 MiB per stream (zip-bomb guard) and
 * a corrupt deflate stream contributes nothing.
 *
 * Scale: same `mapPartitions` codec boundary as images/audio/video/PDF
 * metadata — payloads never touch the driver, output is (id, small
 * scalars, text) so Catalyst prunes the binary column immediately.
 */
object PdfText {

  /** Extracted document text. `n_pages` matches l112's structural
    * count (largest page-tree /Count); `n_chars` = `text.length`
    * (ISO-8859-1 decode ⇒ UTF-16 length = code points). */
  final case class Doc(doc_id: Long, n_pages: Long, text: String,
                       n_chars: Long, container: String)

  /** One indirect object: dictionary text (balanced `<< >>` extent,
    * empty when absent) + raw stream payload when present. */
  private[operators] final case class PdfObj(dict: String, stream: Option[String])

  private val MaxInflated = 64 << 20 // per-stream zip-bomb cap

  // ------------------------------------------------------------ objects

  /** Balanced `<< … >>` extent from `start` (which must point at `<<`).
    * Returns (dict text, index just past the closing `>>`). Unbalanced
    * input degrades to end-of-string. */
  private[operators] def balancedDict(s: String, start: Int): (String, Int) = {
    var depth = 0
    var i = start
    while (i < s.length) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return (s.substring(start, i), i)
      } else i += 1
    }
    (s.substring(start), s.length)
  }

  /** Direct /Length value; indirect (`N 0 R`) lengths are skipped (the
    * fallback scans for `endstream` instead). */
  private val DirectLength = "/Length\\s+(\\d{1,9})(?!\\d)(?!\\s+\\d+\\s+R)".r

  /** `/Key N 0 R` or `/Key [N 0 R M 0 R …]` → referenced object
    * numbers in written order. */
  private def refList(dict: String, key: String): Seq[Long] = {
    val arr = ("(?s)/" + key + "\\s*\\[(.*?)\\]").r
    arr.findFirstMatchIn(dict) match {
      case Some(m) =>
        "(\\d{1,9})\\s+\\d+\\s+R".r.findAllMatchIn(m.group(1))
          .map(_.group(1).toLong).toSeq
      case None =>
        ("/" + key + "\\s+(\\d{1,9})\\s+\\d+\\s+R").r
          .findFirstMatchIn(dict).map(_.group(1).toLong).toSeq
    }
  }

  /** Sequential object scan: `N G obj` → optional dict → optional
    * stream (`/Length`-bounded when the direct length lines up with an
    * `endstream` keyword; keyword-scan fallback otherwise — binary
    * stream data must not derail the walk). Incremental updates keep
    * LAST-writer-wins, the PDF update semantics. `withStreams = false`
    * still computes stream EXTENTS (the walk must skip them) but never
    * materializes their payload substrings — the dict-only mode the
    * metadata encryption check uses — EXCEPT for `/Type /ObjStm`
    * object streams (ISO 32000 §7.5.7), whose payload holds the
    * embedded objects' dictionaries and is therefore inflated and
    * expanded in BOTH modes: each `num offset` pair of the stream
    * header yields an embedded object inserted at the container's
    * position (so last-writer-wins composes across layouts). This is
    * how PDF 1.5+ files whose page trees live in compressed object
    * streams resolve; the companion cross-reference STREAM
    * (`/Type /XRef`, §7.5.8) needs no decoding here — its dictionary
    * (the part carrying `/Root` and `/Encrypt`) is plaintext by spec,
    * and object locations come from this keyword walk, not the xref. */
  /** `decrypt` (when non-null) maps one materialized stream payload
    * (num, gen, dict, raw) → plaintext BEFORE any filter decode — the
    * §7.6.2 ordering (a writer filters, THEN encrypts), used by the
    * [[PdfCrypt]] empty-user-password path. ObjStm payloads pass
    * through it too (object streams ARE encrypted), so compressed
    * layouts expand from plaintext. */
  private[operators] def parseObjects(s: String, withStreams: Boolean = true,
      decrypt: (Long, Int, String, String) => String = null): mutable.LinkedHashMap[Long, PdfObj] = {
    val out = mutable.LinkedHashMap[Long, PdfObj]()
    val objPat = java.util.regex.Pattern.compile("(\\d{1,9})\\s+(\\d{1,5})\\s+obj\\b")
    val mt = objPat.matcher(s)
    var pos = 0
    while (pos < s.length && mt.find(pos)) {
      val num = mt.group(1).toLong
      val gen = mt.group(2).toInt
      var i = mt.end
      while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
      val (dict, afterDict) =
        if (s.startsWith("<<", i)) balancedDict(s, i)
        else {
          // dict-less body (bare name / number / array — e.g. an
          // indirect /Encoding that is just `/WinAnsiEncoding`,
          // §9.6.5 allows it): retain a bounded prefix so resolvers
          // can still read the value
          val e = s.indexOf("endobj", i)
          val end = math.min(if (e < 0) s.length else e, i + 256)
          (s.substring(i, end).trim, i)
        }
      var j = afterDict
      while (j < s.length && Character.isWhitespace(s.charAt(j))) j += 1
      var stream: Option[String] = None
      var objStmPayload: Option[String] = None
      var next = math.max(j, mt.end)
      if (s.startsWith("stream", j)) {
        var d = j + 6
        if (d < s.length && s.charAt(d) == '\r') d += 1
        if (d < s.length && s.charAt(d) == '\n') d += 1
        // trust the direct /Length only when `endstream` follows within
        // a 2-char EOL slack; else scan for the keyword
        val byLen = DirectLength.findFirstMatchIn(dict).map(_.group(1).toInt)
          .filter(l => l >= 0 && d + l <= s.length)
          .map(l => d + l)
          .filter { e =>
            val k = s.indexOf("endstream", e)
            k >= 0 && k - e <= 2
          }
        val end = byLen.getOrElse {
          val e = s.indexOf("endstream", d)
          if (e < 0) s.length
          else { // strip one trailing EOL the writer added before the keyword
            var k = e
            if (k > d && s.charAt(k - 1) == '\n') k -= 1
            if (k > d && s.charAt(k - 1) == '\r') k -= 1
            k
          }
        }
        val isObjStm = TypeObjStm.findFirstIn(dict).isDefined
        val payload =
          if (withStreams || isObjStm) {
            val raw = s.substring(d, math.min(end, s.length))
            if (decrypt != null) decrypt(num, gen, dict, raw) else raw
          } else "" // extent skipped; payload not materialized
        stream = Some(if (withStreams) payload else "")
        if (isObjStm) objStmPayload = Some(payload)
        next = s.indexOf("endobj", math.min(end, s.length)) match {
          case -1 => math.min(end + 9, s.length)
          case e  => e + 6
        }
      } else {
        next = s.indexOf("endobj", j) match {
          case -1 => math.max(j, mt.end)
          case e  => e + 6
        }
      }
      out(num) = PdfObj(dict, stream)
      // expand AFTER the container insert so embedded objects land at
      // (and can shadow) this position under last-writer-wins
      objStmPayload.foreach(expandObjStm(dict, _, out))
      pos = math.max(next, mt.end)
    }
    out
  }

  private val TypeObjStm = "(?s)/Type\\s*/ObjStm(?![a-zA-Z])".r
  private val IntPair = "(\\d{1,9})\\s+(\\d{1,9})".r

  /** Expand one `/Type /ObjStm` object stream (ISO 32000 §7.5.7): the
    * decoded payload is `/N` whitespace-separated `objnum offset`
    * pairs followed (at `/First`) by the serialized objects, offsets
    * relative to `/First`. Streams are forbidden inside an ObjStm, so
    * each embedded object is at most a dictionary — exactly what the
    * page-tree walk and the metadata checks consume. Corrupt or
    * truncated payloads expand to however many pairs parse (degrade,
    * never throw); the 64 MiB inflate cap already bounds the decode. */
  private def expandObjStm(dict: String, raw: String,
                           out: mutable.LinkedHashMap[Long, PdfObj]): Unit = {
    val decoded = decodeStream(dict, raw)
    if (decoded.isEmpty) return
    val n = "/N\\s+(\\d{1,9})".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt).getOrElse(0)
    val first = "/First\\s+(\\d{1,9})".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt).getOrElse(0)
    if (n <= 0 || first <= 0 || first > decoded.length) return
    val pairs = IntPair.findAllMatchIn(decoded.substring(0, first))
      .map(m => (m.group(1).toLong, m.group(2).toInt)).take(n).toVector
    val offsets = pairs.map(_._2).sorted // defensive: spec does not require ascending
    pairs.foreach { case (num, off) =>
      val start = first.toLong + off
      if (start <= decoded.length) {
        val to = offsets.find(_ > off)
          .map(o => math.min(first.toLong + o, decoded.length).toInt)
          .getOrElse(decoded.length)
        var i = start.toInt
        while (i < to && Character.isWhitespace(decoded.charAt(i))) i += 1
        val d2 =
          if (decoded.startsWith("<<", i)) balancedDict(decoded, i)._1 else ""
        out(num) = PdfObj(d2, None)
      }
    }
  }

  // ---------------------------------------------------------- page walk

  private val TypeCatalog = "(?s)/Type\\s*/Catalog".r
  private val TypePages = "(?s)/Type\\s*/Pages(?![a-zA-Z])".r
  private val TypePage = "(?s)/Type\\s*/Page(?![a-zA-Z])".r

  // --------------------------------------------------- /ToUnicode CMap

  /** One font's `/ToUnicode` mapping (ISO 32000 §9.10.3): explicit
    * bfchar codes plus bfrange runs, looked up lazily — ranges are
    * NEVER materialized (a `<0000> <FFFF>` run would be 64Ki entries
    * PER DOCUMENT on the corpus path; a find over a handful of range
    * triples is cheaper than the map it would build). Range offsets
    * increment the dst's last UTF-16 unit — the superset reading of
    * the spec's last-byte rule (real CMaps keep ranges inside one
    * 256-block, where the two readings agree). */
  private[operators] final case class CMap(codeBytes: Int, chars: Map[Int, String],
                                           ranges: Vector[(Int, Int, Vector[Int])]) {
    /** Appends the mapping of `code` to `out` and returns true, or
      * returns false when no entry covers it (caller falls back to the
      * raw bytes). Append-into-builder keeps the per-CHARACTER corpus
      * hot path (one call per code of every extracted string)
      * allocation-free for the common single-unit range hit. */
    def appendLookup(code: Int, out: StringBuilder): Boolean =
      chars.get(code) match {
        case Some(s) => out.append(s); true
        case None =>
          var i = 0
          while (i < ranges.length) {
            val (lo, hi, dst) = ranges(i)
            if (code >= lo && code <= hi) {
              var k = 0
              while (k < dst.length - 1) { out.append(dst(k).toChar); k += 1 }
              out.append(((dst(dst.length - 1) + (code - lo)) & 0xFFFF).toChar)
              return true
            }
            i += 1
          }
          false
      }

    def lookup(code: Int): Option[String] = {
      val sb = new StringBuilder(2)
      if (appendLookup(code, sb)) Some(sb.toString) else None
    }
  }

  private def isHex(c: Char): Boolean = Character.digit(c, 16) >= 0

  /** `<hex>` payload → UTF-16BE units (4 hex digits each; a short
    * final group right-pads with 0, mirroring the hex-string rule). */
  private def hexUnits(h: String): Vector[Int] = {
    val clean = h.filter(isHex)
    val padded = clean + "0" * ((4 - clean.length % 4) % 4)
    (0 until padded.length / 4)
      .map(k => Integer.parseInt(padded.substring(4 * k, 4 * k + 4), 16)).toVector
  }

  private val BfCharSec = "(?s)beginbfchar(.*?)endbfchar".r
  private val BfRangeSec = "(?s)beginbfrange(.*?)endbfrange".r
  private val CodeSpaceSec = "(?s)begincodespacerange(.*?)endcodespacerange".r
  private val HexTok = "<([0-9A-Fa-f\\s]*)>".r
  private val RangeTriple =
    ("<([0-9A-Fa-f\\s]+)>\\s*<([0-9A-Fa-f\\s]+)>\\s*" +
      "(?:<([0-9A-Fa-f\\s]+)>|\\[([^\\]]*)\\])").r

  /** Parse a decoded `/ToUnicode` stream. Code width comes from the
    * codespacerange when present, else the widest bfchar/bfrange
    * source code, clamped to the 1–2 bytes simple and CID fonts use.
    * `None` when no mapping parses (garbage stream → raw fallback). */
  private[operators] def parseToUnicode(s: String): Option[CMap] = {
    val chars = Map.newBuilder[Int, String]
    val ranges = Vector.newBuilder[(Int, Int, Vector[Int])]
    var width = 0
    var any = false
    def srcCode(h: String): Int = {
      val clean = h.filter(isHex).takeRight(8) // defensive cap
      width = math.max(width, (clean.length + 1) / 2)
      if (clean.isEmpty) 0 else Integer.parseInt(clean, 16)
    }
    CodeSpaceSec.findAllMatchIn(s).foreach { m =>
      HexTok.findAllMatchIn(m.group(1)).foreach { h =>
        width = math.max(width, (h.group(1).count(isHex) + 1) / 2)
      }
    }
    BfCharSec.findAllMatchIn(s).foreach { m =>
      HexTok.findAllMatchIn(m.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) =>
          chars += srcCode(src) -> hexUnits(dst).map(_.toChar).mkString
          any = true
        case _ => () // odd trailing token: degrade
      }
    }
    BfRangeSec.findAllMatchIn(s).foreach { m =>
      RangeTriple.findAllMatchIn(m.group(1)).foreach { t =>
        val lo = srcCode(t.group(1))
        val hi = srcCode(t.group(2))
        if (hi >= lo) {
          if (t.group(3) != null) {
            val dst = hexUnits(t.group(3))
            if (dst.nonEmpty) { ranges += ((lo, hi, dst)); any = true }
          } else { // array form: one dst string per code, in order
            val dsts = HexTok.findAllMatchIn(t.group(4)).map(_.group(1)).toVector
            dsts.take(hi - lo + 1).zipWithIndex.foreach { case (d, k) =>
              chars += (lo + k) -> hexUnits(d).map(_.toChar).mkString
              any = true
            }
          }
        }
      }
    }
    if (any) Some(CMap(math.min(math.max(width, 1), 2), chars.result(), ranges.result()))
    else None
  }

  /** Re-read a raw (ISO-8859-1-decoded, one char per byte) string
    * operand through the active CMap: big-endian `codeBytes` groups,
    * unmapped codes (and a trailing odd byte) keep their raw chars. */
  private def applyCMap(raw: String, cm: CMap): String = {
    val out = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      if (cm.codeBytes == 2 && i + 1 < raw.length) {
        val code = ((raw.charAt(i) & 0xFF) << 8) | (raw.charAt(i + 1) & 0xFF)
        if (!cm.appendLookup(code, out))
          out.append(raw.charAt(i)).append(raw.charAt(i + 1))
        i += 2
      } else if (cm.codeBytes == 2) { out.append(raw.charAt(i)); i += 1 }
      else {
        if (!cm.appendLookup(raw.charAt(i) & 0xFF, out))
          out.append(raw.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  // --------------------------------------- /Encoding /Differences fonts

  /** Adobe Glyph List, the common subset (public AGL specification):
    * the names standard encodings and /Differences arrays actually
    * use — ASCII names, the Latin-1 supplement, and the WinAnsi
    * typographic set. Arbitrary Unicode goes through the `uniXXXX` /
    * `uXXXX[XX]` name forms in [[glyphToUnicode]], so this table stays
    * small without limiting coverage. */
  private val AglNames: Map[String, Char] = {
    val b = Map.newBuilder[String, Char]
    ('A' to 'Z').foreach(c => b += c.toString -> c)
    ('a' to 'z').foreach(c => b += c.toString -> c)
    Seq("zero", "one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine").zipWithIndex.foreach { case (n, i) => b += n -> ('0' + i).toChar }
    val punct = Seq(
      "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"', "numbersign" -> '#',
      "dollar" -> '$', "percent" -> '%', "ampersand" -> '&', "quotesingle" -> '\'',
      "parenleft" -> '(', "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
      "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
      "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
      "greater" -> '>', "question" -> '?', "at" -> '@', "bracketleft" -> '[',
      "backslash" -> '\\', "bracketright" -> ']', "asciicircum" -> '^',
      "underscore" -> '_', "grave" -> '`', "braceleft" -> '{', "bar" -> '|',
      "braceright" -> '}', "asciitilde" -> '~',
      // Latin-1 supplement
      "exclamdown" -> '¡', "cent" -> '¢', "sterling" -> '£',
      "currency" -> '¤', "yen" -> '¥', "brokenbar" -> '¦',
      "section" -> '§', "dieresis" -> '¨', "copyright" -> '©',
      "ordfeminine" -> 'ª', "guillemotleft" -> '«',
      "logicalnot" -> '¬', "registered" -> '®', "macron" -> '¯',
      "degree" -> '°', "plusminus" -> '±', "acute" -> '´',
      "mu" -> 'µ', "paragraph" -> '¶', "periodcentered" -> '·',
      "cedilla" -> '¸', "ordmasculine" -> 'º',
      "guillemotright" -> '»', "onequarter" -> '¼',
      "onehalf" -> '½', "threequarters" -> '¾',
      "questiondown" -> '¿', "multiply" -> '×', "divide" -> '÷',
      // WinAnsi typographic set
      "quoteleft" -> '‘', "quoteright" -> '’',
      "quotedblleft" -> '“', "quotedblright" -> '”',
      "quotesinglbase" -> '‚', "quotedblbase" -> '„',
      "endash" -> '–', "emdash" -> '—', "bullet" -> '•',
      "dagger" -> '†', "daggerdbl" -> '‡', "ellipsis" -> '…',
      "perthousand" -> '‰', "trademark" -> '™', "Euro" -> '€',
      "florin" -> 'ƒ', "circumflex" -> 'ˆ', "tilde" -> '˜',
      "Scaron" -> 'Š', "scaron" -> 'š', "OE" -> 'Œ',
      "oe" -> 'œ', "Ydieresis" -> 'Ÿ', "Zcaron" -> 'Ž',
      "zcaron" -> 'ž', "guilsinglleft" -> '‹',
      "guilsinglright" -> '›', "fi" -> 'ﬁ', "fl" -> 'ﬂ')
    b ++= punct
    // accented Latin-1 letters: names are systematic (base + accent)
    val accents = Seq("grave" -> 0, "acute" -> 1, "circumflex" -> 2,
      "tilde" -> 3, "dieresis" -> 4)
    def acc(base: Char, at: Int, names: Seq[(String, Int)]): Unit =
      names.foreach { case (n, i) => b += (base + n) -> (at + i).toChar }
    acc('A', 0xC0, accents); acc('a', 0xE0, accents)
    acc('E', 0xC8, accents.take(3) :+ ("dieresis" -> 3)); acc('e', 0xE8, accents.take(3) :+ ("dieresis" -> 3))
    acc('I', 0xCC, accents.take(3) :+ ("dieresis" -> 3)); acc('i', 0xEC, accents.take(3) :+ ("dieresis" -> 3))
    acc('O', 0xD2, accents); acc('o', 0xF2, accents)
    acc('U', 0xD9, accents.take(3) :+ ("dieresis" -> 3)); acc('u', 0xF9, accents.take(3) :+ ("dieresis" -> 3))
    b += "Aring" -> 'Å'; b += "aring" -> 'å'
    b += "AE" -> 'Æ'; b += "ae" -> 'æ'
    b += "Ccedilla" -> 'Ç'; b += "ccedilla" -> 'ç'
    b += "Eth" -> 'Ð'; b += "eth" -> 'ð'
    b += "Ntilde" -> 'Ñ'; b += "ntilde" -> 'ñ'
    b += "Oslash" -> 'Ø'; b += "oslash" -> 'ø'
    b += "Yacute" -> 'Ý'; b += "yacute" -> 'ý'
    b += "Thorn" -> 'Þ'; b += "thorn" -> 'þ'
    b += "germandbls" -> 'ß'; b += "ydieresis" -> 'ÿ'
    b.result()
  }

  /** One glyph name → Unicode per the AGL algorithm: `uniXXXX[XXXX…]`
    * (one or more 4-hex UTF-16 units), `uXXXX`–`uXXXXXX` (a code
    * point), else the common-name table. None = unknown name (the
    * code keeps its raw fallback). */
  private[operators] def glyphToUnicode(name: String): Option[String] = {
    if (name.length >= 7 && name.startsWith("uni") &&
        (name.length - 3) % 4 == 0 && name.drop(3).forall(isHex))
      Some(name.drop(3).grouped(4)
        .map(h => Integer.parseInt(h, 16).toChar).mkString)
    else if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u' &&
             name.drop(1).forall(isHex)) {
      val cp = Integer.parseInt(name.drop(1), 16)
      if (cp >= 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
        Some(new String(Character.toChars(cp)))
      else None
    } else AglNames.get(name).map(_.toString)
  }

  private val DifferencesArr = "(?s)/Differences\\s*\\[(.*?)\\]".r
  private val DiffToken = "(\\d{1,3})(?![0-9])|/([^\\s/<>\\[\\]()]+)".r

  /** An `/Encoding` dictionary's `/Differences` array (ISO 32000
    * §9.6.5.1: an integer sets the next code, each following name
    * assigns consecutive codes) as a 1-byte [[CMap]] — the simple-font
    * twin of /ToUnicode. Codes whose names don't resolve (or outside
    * 0–255) keep the raw base-encoding fallback; base encodings
    * themselves stay the documented ISO-8859-1 reading. */
  private[operators] def parseDifferences(encDict: String): Option[CMap] =
    DifferencesArr.findFirstMatchIn(encDict).flatMap { m =>
      val chars = Map.newBuilder[Int, String]
      var code = -1
      var any = false
      DiffToken.findAllMatchIn(m.group(1)).foreach { t =>
        if (t.group(1) != null) code = t.group(1).toInt
        else {
          if (code >= 0 && code <= 255)
            glyphToUnicode(t.group(2)).foreach { u => chars += code -> u; any = true }
          code += 1 // names consume consecutive codes even when unmapped
        }
      }
      if (any) Some(CMap(1, chars.result(), Vector.empty)) else None
    }

  // ------------------------------------------- named base encodings

  /** cp1252's 0x80–0x9F block — exactly where `/WinAnsiEncoding`
    * (ISO 32000 Annex D.2) differs from the raw ISO-8859-1 reading:
    * smart quotes, en/em dashes, €, ™, … — the characters
    * Word-exported PDFs use constantly. Built from the JDK's public
    * windows-1252 charset; the five undefined positions (0x81, 0x8D,
    * 0x8F, 0x90, 0x9D) decode as C1 controls there and are dropped so
    * they keep the raw fallback. Below 0x80 and from 0xA0 up, WinAnsi
    * agrees with Latin-1, which IS the raw fallback. */
  private[operators] val WinAnsiHigh: Map[Int, String] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    (0x80 to 0x9F).flatMap { b =>
      val s = new String(Array(b.toByte), cs)
      // undefined positions decode as U+FFFD — drop them (raw fallback)
      if (s.length == 1 && s.charAt(0) >= 0xA0 && s.charAt(0) != '�')
        Some(b -> s)
      else None
    }.toMap
  }

  /** `/MacRomanEncoding` (Annex D.2) over its full 0x80–0xFF high
    * half, from the JDK's x-MacRoman charset with the two Annex-D
    * deviations: 0xDB is `currency` (not the post-8.5 €) and 0xF0
    * (the Apple private-use glyph) is undefined. */
  private[operators] val MacRomanHigh: Map[Int, String] =
    try {
      val cs = java.nio.charset.Charset.forName("x-MacRoman")
      ((0x80 to 0xFF).flatMap { b =>
        val s = new String(Array(b.toByte), cs)
        if (s.length == 1 && s.charAt(0) != '�') Some(b -> s) else None
      }.toMap - 0xF0) + (0xDB -> "¤")
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  private[operators] def baseEncodingTable(name: String): Option[Map[Int, String]] =
    name match {
      case "WinAnsiEncoding" => Some(WinAnsiHigh)
      case "MacRomanEncoding" => Some(MacRomanHigh)
      // StandardEncoding / PDFDocEncoding stay on the documented raw
      // ISO-8859-1 reading (they agree with it on ASCII, and no
      // mainstream writer pairs them with non-ASCII simple-font text)
      case _ => None
    }

  private val BaseEncEntry = "/BaseEncoding\\s*/([A-Za-z0-9]+)".r
  private val EncNameEntry = "/Encoding\\s*/([A-Za-z0-9]+)".r
  // a body that IS a bare name, nothing else (anchored: never fires
  // on a dict or array body)
  private val BareEncName = "^/([A-Za-z0-9]+)$".r

  /** `/Key << … >>` inline sub-dictionary of `dict`, when present. */
  private def dictValueDict(dict: String, key: String): Option[String] =
    ("(?s)/" + key + "\\s*<<").r.findFirstMatchIn(dict)
      .map(m => balancedDict(dict, m.end - 2)._1)

  private val FontEntry = "/([^\\s/<>\\[\\]()]+)\\s+(\\d{1,9})\\s+\\d+\\s+R".r

  /** Resolve a page's `/Resources /Font` dict to (font name →
    * /ToUnicode CMap) — inline dicts and indirect refs both accepted,
    * fonts without a usable /ToUnicode simply absent (raw fallback).
    * `cache` memoizes per-font-object parses across pages. */
  private def fontsOf(resDict: Option[String],
                      objs: mutable.LinkedHashMap[Long, PdfObj],
                      cache: mutable.Map[Long, Option[CMap]]): Map[String, CMap] =
    resDict.flatMap { rd =>
      dictValueDict(rd, "Font")
        .orElse(refList(rd, "Font").headOption.flatMap(objs.get).map(_.dict))
    }.map { fd =>
      FontEntry.findAllMatchIn(fd).flatMap { m =>
        cache.getOrElseUpdate(m.group(2).toLong,
          objs.get(m.group(2).toLong).flatMap { fo =>
            // /ToUnicode is authoritative for extraction (§9.10.2);
            // a simple font without one falls back to its /Encoding —
            // a dict (inline or indirect) whose named /BaseEncoding
            // table fills every code the /Differences array doesn't
            // override (§9.6.5), or the base-encoding NAME alone —
            // and only then to the raw ISO-8859-1 reading
            refList(fo.dict, "ToUnicode").headOption
              .flatMap(objs.get)
              .flatMap(tu => tu.stream.map(raw => decodeStream(tu.dict, raw)))
              .flatMap(parseToUnicode)
              .orElse {
                dictValueDict(fo.dict, "Encoding")
                  .orElse(refList(fo.dict, "Encoding").headOption
                    .flatMap(objs.get).map(_.dict)) match {
                  case Some(encDict) =>
                    // /BaseEncoding inside the dict, or — when the
                    // indirect object's whole body is a bare base-
                    // encoding name (`6 0 obj /WinAnsiEncoding
                    // endobj`) — that name itself
                    val base = BaseEncEntry.findFirstMatchIn(encDict)
                      .map(_.group(1))
                      .orElse(BareEncName.findFirstMatchIn(encDict.trim)
                        .map(_.group(1)))
                      .flatMap(baseEncodingTable)
                      .getOrElse(Map.empty)
                    parseDifferences(encDict) match {
                      case Some(cm) => Some(cm.copy(chars = base ++ cm.chars))
                      case None if base.nonEmpty => Some(CMap(1, base, Vector.empty))
                      case None => None
                    }
                  case None =>
                    EncNameEntry.findFirstMatchIn(fo.dict).map(_.group(1))
                      .flatMap(baseEncodingTable)
                      .map(t => CMap(1, t, Vector.empty))
                }
              }
          })
          .map(m.group(1) -> _)
      }.toMap
    }.getOrElse(Map.empty)

  /** A page's `/Resources` dict text: inline or indirect, the page's
    * own entry winning over the inherited page-tree one (§7.7.3.4). */
  private def resourcesOf(dict: String,
                          objs: mutable.LinkedHashMap[Long, PdfObj]): Option[String] =
    dictValueDict(dict, "Resources")
      .orElse(refList(dict, "Resources").headOption.flatMap(objs.get).map(_.dict))

  /** Content streams in PAGE-TREE order (Kids order, not object-number
    * order — the document's reading order), each paired with its
    * page's resolved font CMaps (`/Resources` inherited down the tree
    * per §7.7.3.4). Falls back to every stream
    * in object order only when NO page leaf resolves (no /Root, no
    * tree, or a truncated tree), so truncated files still surface
    * whatever text their streams carry — while a VALID document whose
    * pages simply carry no /Contents correctly extracts "" instead of
    * scanning unrelated binary streams (fonts, images) for
    * text-lookalike bytes. */
  private def pageContentStreams(s: String, objs: mutable.LinkedHashMap[Long, PdfObj]): Seq[(String, Map[String, CMap])] = {
    val rootRef = "(?s)/Root\\s+(\\d{1,9})\\s+\\d+\\s+R".r
      .findAllMatchIn(s).map(_.group(1).toLong).toSeq.lastOption
      .orElse(objs.collectFirst {
        case (n, o) if TypeCatalog.findFirstIn(o.dict).isDefined => n
      })
    val pagesRoot = rootRef.flatMap(objs.get)
      .flatMap(o => refList(o.dict, "Pages").headOption)
      .orElse(objs.collectFirst {
        case (n, o) if TypePages.findFirstIn(o.dict).isDefined &&
          !o.dict.contains("/Parent") => n
      })
    val visited = mutable.Set[Long]()
    val streams = mutable.Buffer[(String, Map[String, CMap])]()
    val cmapCache = mutable.Map[Long, Option[CMap]]()
    var sawLeaf = false
    def walk(num: Long, depth: Int, inheritedRes: Option[String]): Unit = {
      if (depth > 64 || !visited.add(num)) return
      objs.get(num).foreach { o =>
        val res = resourcesOf(o.dict, objs).orElse(inheritedRes)
        if (TypePage.findFirstIn(o.dict).isDefined &&
            TypePages.findFirstIn(o.dict).isEmpty) {
          sawLeaf = true
          val fonts = fontsOf(res, objs, cmapCache)
          refList(o.dict, "Contents").foreach { c =>
            objs.get(c).foreach(co =>
              co.stream.foreach(raw =>
                streams += ((decodeStream(co.dict, raw), fonts))))
          }
        } else {
          refList(o.dict, "Kids").foreach(walk(_, depth + 1, res))
        }
      }
    }
    pagesRoot.foreach(walk(_, 0, None))
    if (!sawLeaf)
      objs.foreach { case (_, o) =>
        o.stream.foreach(raw =>
          streams += ((decodeStream(o.dict, raw), Map.empty[String, CMap])))
      }
    streams.toSeq
  }

  /** Stream filters applied IN LISTED ORDER (ISO 32000 §7.4 — a
    * `/Filter [/ASCII85Decode /FlateDecode]` chain is ASCII-armored
    * deflate, the email-safe shape): FlateDecode, ASCIIHexDecode,
    * ASCII85Decode and RunLengthDecode decode; any unknown filter in
    * the chain yields no
    * text (emitting partially-decoded bytes as "text" would be
    * garbage, not degradation — stated, not faked). No filter = raw.
    * `/DecodeParms` predictors are not applied (they dress xref
    * streams, not real-world content streams) — a predictor-dressed
    * content stream inflates to prediction deltas with no BT block,
    * so it degrades to empty rather than emitting noise. */
  private val FilterEntry = "/Filter\\s*(?:\\[([^\\]]*)\\]|/([A-Za-z0-9]+))".r
  private val NameToken = "/([A-Za-z0-9]+)".r

  private def filterList(dict: String): Seq[String] =
    FilterEntry.findFirstMatchIn(dict).map { m =>
      if (m.group(1) != null)
        NameToken.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
      else Seq(m.group(2))
    }.getOrElse(Seq.empty)

  /** ASCIIHexDecode (§7.4.2): hex digit pairs, whitespace ignored,
    * `>` is EOD, an odd final digit pads a trailing 0. Non-hex junk
    * before EOD is ignored (lenient degrade). */
  private[operators] def asciiHexDecode(s: String): String = {
    val end = s.indexOf('>')
    val body = if (end < 0) s else s.substring(0, end)
    val hex = body.filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val out = new StringBuilder(padded.length / 2)
    var k = 0
    while (k + 2 <= padded.length) {
      out.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar)
      k += 2
    }
    out.toString
  }

  /** ASCII85Decode (§7.4.3): 5 chars `!`..`u` → 4 bytes base-85
    * big-endian, `z` = four zero bytes between groups, whitespace
    * ignored, `~>` is EOD; a final partial group of n chars pads with
    * `u` and emits n−1 bytes. Any other character → None (corrupt
    * armor, degrade). */
  private[operators] def ascii85Decode(s: String): Option[String] = {
    val out = new StringBuilder(s.length * 4 / 5)
    var acc = 0L
    var n = 0
    var i = 0
    var done = false
    while (i < s.length && !done) {
      val c = s.charAt(i)
      if (c == '~') done = true
      else if (Character.isWhitespace(c)) ()
      else if (c == 'z' && n == 0) // four zero bytes
        out.append('\u0000').append('\u0000').append('\u0000').append('\u0000')
      else if (c >= '!' && c <= 'u') {
        acc = acc * 85 + (c - '!')
        n += 1
        if (n == 5) {
          out.append(((acc >> 24) & 0xFF).toChar).append(((acc >> 16) & 0xFF).toChar)
            .append(((acc >> 8) & 0xFF).toChar).append((acc & 0xFF).toChar)
          acc = 0L; n = 0
        }
      } else return None // corrupt armor
      i += 1
    }
    if (n == 1) return None // a lone trailing char cannot encode bytes
    if (n > 1) {
      val pad = 5 - n
      var a = acc
      var k = 0
      while (k < pad) { a = a * 85 + 84; k += 1 } // pad with 'u'
      val bytes = Seq(((a >> 24) & 0xFF), ((a >> 16) & 0xFF), ((a >> 8) & 0xFF))
        .take(n - 1)
      bytes.foreach(b => out.append(b.toChar))
    }
    Some(out.toString)
  }

  /** RunLengthDecode (§7.4.5): length byte L ≤ 127 copies the next
    * L+1 bytes literally, L ≥ 129 repeats the next byte 257−L times,
    * L = 128 is EOD. A truncated run decodes what fits (degrade). */
  private[operators] def runLengthDecode(s: String): String = {
    val out = new StringBuilder(s.length)
    // one array copy for the whole stream, not one per literal chunk —
    // toCharArray inside the loop is O(n²) on literal-heavy streams
    val arr = s.toCharArray
    var i = 0
    var done = false
    while (i < s.length && !done) {
      val l = s.charAt(i) & 0xFF
      if (l == 128) done = true
      else if (l <= 127) {
        val n = math.min(l + 1, s.length - i - 1)
        out.appendAll(arr, i + 1, n)
        i += 1 + l + 1
      } else {
        if (i + 1 < s.length) {
          val c = s.charAt(i + 1)
          var k = 0
          while (k < 257 - l) { out.append(c); k += 1 }
        }
        i += 2
      }
    }
    out.toString
  }

  private def decodeStream(dict: String, raw: String): String =
    if (!dict.contains("/Filter")) raw
    else filterList(dict).foldLeft(Option(raw)) { (acc, f) =>
      acc.flatMap(s => f match {
        case "FlateDecode" => Some(inflate(s)) // corrupt deflate → ""
        case "ASCIIHexDecode" => Some(asciiHexDecode(s))
        case "ASCII85Decode" => ascii85Decode(s)
        case "RunLengthDecode" => Some(runLengthDecode(s))
        case _ => None // unknown filter: no text, never garbage
      })
    }.getOrElse("")

  /** Shared bounded inflate (zlib or raw per `nowrap`): 64 MiB
    * zip-bomb cap, truncated input stops cleanly, corrupt data → None.
    * Used by the PDF FlateDecode path and [[OfficeZip]]'s deflated
    * members — one place for the cap and truncation semantics. */
  private[operators] def inflateBytes(bytes: Array[Byte], off: Int, len: Int,
                                      nowrap: Boolean,
                                      sizeHint: Int = 1 << 16): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(bytes, off, len)
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, math.min(sizeHint, 1 << 16)))
      val buf = new Array[Byte](8192)
      var done = false
      while (!done && !inf.finished() && out.size < MaxInflated) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) done = true // truncated
      }
      Some(out.toByteArray)
    } catch {
      case NonFatal(_) => None // corrupt deflate data
    } finally inf.end()
  }

  private def inflate(raw: String): String = {
    val bytes = raw.getBytes(ISO_8859_1)
    inflateBytes(bytes, 0, bytes.length, nowrap = false,
        sizeHint = bytes.length * 4)
      .map(new String(_, ISO_8859_1)).getOrElse("")
  }

  // ------------------------------------------------------ content walk

  /** Literal `(…)` string from `open` (pointing at `(`): spec escapes,
    * balanced unescaped parens. Returns (decoded, index past `)`). */
  private[operators] def literalString(cs: String, open: Int, to: Int): (String, Int) = {
    val out = new StringBuilder
    var i = open + 1
    var depth = 1
    while (i < to && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < to) {
        cs.charAt(i + 1) match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case e @ ('(' | ')' | '\\') => out.append(e); i += 2
          case '\r' => // backslash–EOL: line continuation, drop both
            i += 2; if (i < to && cs.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = i + 1; var n = 0
            while (k < to && n < 3 && cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
              v = v * 8 + (cs.charAt(k) - '0'); k += 1; n += 1
            }
            out.append((v & 0xFF).toChar); i = k
          case other => out.append(other); i += 2 // spec: drop the backslash
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) out.append(c); i += 1 }
      else { out.append(c); i += 1 }
    }
    (out.toString, i)
  }

  /** Hex `<…>` string: pair hex digits (whitespace ignored, odd length
    * pads a trailing 0). Returns (decoded, index past `>`). */
  private[operators] def hexString(cs: String, open: Int, to: Int): (String, Int) = {
    val close = cs.indexOf('>', open + 1)
    val end = if (close < 0 || close > to) to else close
    val hex = cs.substring(open + 1, end).filter(ch => Character.digit(ch, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val out = new StringBuilder(padded.length / 2)
    var k = 0
    while (k + 2 <= padded.length) {
      out.append(Integer.parseInt(padded.substring(k, k + 2), 16).toChar)
      k += 2
    }
    (out.toString, if (close < 0 || close > to) to else close + 1)
  }

  /** One decoded content stream: a SINGLE token scan with an in-text
    * flag. `BT`/`ET` are recognized only as standalone operator tokens
    * (maximal letter runs), so an `ET` inside a shown string
    * ("RETURN") or inside a longer operand ("BETWEEN") can neither end
    * a block nor open a phantom one; strings are parsed — and merely
    * skipped — even OUTSIDE text blocks, so their contents never look
    * like operators to the scanner. Inside a block, string operands
    * and the text-showing / line-move operators fold into `sb` under
    * the contract in the object doc; everything else is skipped. */
  private def extractTextOps(cs: String, sb: StringBuilder,
                             fonts: Map[String, CMap] = Map.empty): Unit = {
    val to = cs.length
    var i = 0
    var inText = false
    var pending = "" // last decoded string / concatenated array operand
    var arrayBuf: StringBuilder = null // non-null inside a text-block [ … ]
    var lastName = "" // most recent name token (the Tf font operand)
    var cmap: Option[CMap] = None // current font's /ToUnicode (Tf-selected)
    def newline(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def capture(raw: String): Unit = {
      val str = cmap.map(applyCMap(raw, _)).getOrElse(raw)
      if (arrayBuf != null) arrayBuf.append(str) else pending = str
    }
    while (i < to) {
      val c = cs.charAt(i)
      if (c == '(') {
        val (str, ni) = literalString(cs, i, to)
        if (inText) capture(str)
        i = ni
      } else if (c == '<' && i + 1 < to && cs.charAt(i + 1) == '<') {
        i = balancedDict(cs, i)._2 // inline dict (e.g. BDC props): skip
      } else if (c == '<') {
        val (str, ni) = hexString(cs, i, to)
        if (inText) capture(str)
        i = ni
      } else if (c == '[') { if (inText) arrayBuf = new StringBuilder; i += 1 }
      else if (c == ']') {
        if (inText && arrayBuf != null) { pending = arrayBuf.toString; arrayBuf = null }
        i += 1
      } else if (c == '\'' || c == '"') {
        if (inText) { newline(); sb.append(pending); pending = "" }
        i += 1
      } else if (c == '%') { // comment: runs to end of line (legal
        // whitespace in content streams) — a '(' inside one must not
        // open a string parse and swallow the rest of the stream
        while (i < to && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
      } else if (c == '/') { // name token: remembered (Tf operand), never an op
        i += 1
        val n0 = i
        while (i < to && !Character.isWhitespace(cs.charAt(i)) &&
          "()<>[]{}/%".indexOf(cs.charAt(i)) < 0) i += 1
        lastName = cs.substring(n0, i)
      } else if (Character.isLetter(c)) {
        var j = i
        while (j < to && (Character.isLetterOrDigit(cs.charAt(j)) || cs.charAt(j) == '*')) j += 1
        cs.substring(i, j) match {
          case "BT" => inText = true; pending = ""; arrayBuf = null
          case "ET" => inText = false; pending = ""; arrayBuf = null
          case "Tj" | "TJ" => if (inText) { sb.append(pending); pending = "" }
          case "Td" | "TD" | "T*" => if (inText) newline()
          case "Tf" => cmap = fonts.get(lastName) // font persists past ET (§9.3.1)
          case _ => ()
        }
        i = j
      } else i += 1
    }
  }

  // ------------------------------------------------------------- decode

  /** Full-document extraction; `None` when the payload is not a PDF
    * (no `%PDF-` header — same gate as [[Multimodal.parsePdfMeta]]). */
  def parsePdfText(m: MediaFile): Option[Doc] =
    Multimodal.parsePdfMeta(m).map { pm =>
      val s = new String(m.payload, ISO_8859_1)
      // encrypted: extract ONLY when the empty user password
      // authenticates (the owner-locked common case); a real user
      // password or an unsupported handler keeps the "" contract —
      // ciphertext is not text
      val decrypt = if (pm.encrypted) PdfCrypt.decryptor(s).orNull else null
      val text =
        if (pm.encrypted && decrypt == null) ""
        else {
          val sb = new StringBuilder
          try {
            pageContentStreams(s, parseObjects(s, withStreams = true, decrypt))
              .foreach { case (cs, fonts) =>
                if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
                extractTextOps(cs, sb, fonts)
              }
          } catch { case NonFatal(_) => () } // degrade, never throw
          sb.toString
        }
      Doc(m.doc_id, pm.n_pages, text, text.length.toLong, "pdf")
    }

  /** Stub fallback with [[Multimodal.decodePdf]]'s page arithmetic so
    * the two PDF readouts agree on every column they share. */
  def decodePdfText(m: MediaFile): Doc =
    parsePdfText(m).getOrElse {
      val bl = m.payload.length.toLong
      Doc(m.doc_id, 1L + bl % 9L, "", 0L, "stub")
    }

  /** [[Multimodal.extractMetaPdf]]'s text twin at the same
    * `mapPartitions` boundary. */
  def extractText(files: Dataset[MediaFile]): Dataset[Doc] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodePdfText))
  }

  /** Construction half of the corpus-scale ROUND-TRIP certification
    * (l121): wrap a document's text into a minimal one-page PDF whose
    * content stream shows the text as ONE escaped literal string —
    * `(`/`)`/`\` escaped, UTF-8 bytes carried through the byte-
    * preserving ISO-8859-1 wrap, so extract-then-re-encode returns the
    * original string for ANY unicode input (and any text containing
    * operator lookalikes like "ET" — strings parse before operators).
    * Alternating Flate compression exercises the inflate path on half
    * the corpus. */
  def syntheticPdf(docId: Long, text: String): MediaFile = {
    val wrapped = new String(text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      ISO_8859_1)
    val escaped = wrapped.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
    MediaFile(docId, PdfFixtures.textPdf("1.4", Seq(s"BT ($escaped) Tj ET"),
      flate = docId % 2 == 0, encrypted = false, reverseKids = false))
  }

  /** [[syntheticPdf]]'s PDF 1.5+ twin (l125): same escaped-literal
    * content stream, but the page tree packed into a Flate-compressed
    * `/Type /ObjStm` and the cross-reference written as a `/Type /XRef`
    * stream with no `trailer` keyword — the modern compressed layout
    * most post-2007 writers emit. A round trip through this shape
    * certifies the ObjStm header walk, the embedded-dict expansion,
    * and the xref-stream `/Root` resolution on every document. */
  def syntheticPdfObjStm(docId: Long, text: String): MediaFile = {
    val wrapped = new String(text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      ISO_8859_1)
    val escaped = wrapped.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
    MediaFile(docId, PdfFixtures.objStmPdf("1.5", Seq(s"BT ($escaped) Tj ET"),
      flate = docId % 2 == 0))
  }

  /** [[syntheticPdf]]'s CID-FONT twin (l129): the text's UTF-16 units
    * are written as 2-byte codes `unit + 2` (mod 2^16) in ONE hex
    * string shown through a `/Type0` font whose embedded `/ToUnicode`
    * CMap inverts the shift — two bfrange runs for the shifted body
    * plus two bfchar entries for the wrapped top codes, so EVERY
    * possible unit (surrogates included: a pair maps unit-by-unit and
    * reassembles) round-trips for arbitrary input. The +2 shift makes
    * the mapping non-identity: an extractor that ignored the CMap (or
    * mis-applied a range offset) returns visibly different text, so
    * the oracle match proves the resources→font→CMap chain ran. */
  def syntheticPdfCmap(docId: Long, text: String): MediaFile = {
    val hexDigits = "0123456789ABCDEF"
    val hexSb = new StringBuilder(text.length * 4)
    text.foreach { u =>
      val c = (u + 2) & 0xFFFF
      hexSb.append(hexDigits((c >> 12) & 0xF)).append(hexDigits((c >> 8) & 0xF))
        .append(hexDigits((c >> 4) & 0xF)).append(hexDigits(c & 0xF))
    }
    val hex = hexSb.toString
    val content = s"BT /F1 12 Tf <$hex> Tj ET"
    val cmapSrc =
      "/CIDInit /ProcSet findresource begin\n" +
        "12 dict begin\nbegincmap\n" +
        "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "2 beginbfchar\n<0000> <FFFE>\n<0001> <FFFF>\nendbfchar\n" +
        "2 beginbfrange\n" +
        "<0002> <0101> <0000>\n" + // codes 2..257   → units 0x0000..0x00FF
        "<0102> <FFFF> <0100>\n" + // codes 258..65535 → units 0x0100..0xFFFD
        "endbfrange\nendcmap\nend\nend"
    MediaFile(docId,
      PdfFixtures.cmapPdf("1.6", content, cmapSrc, flate = docId % 2 == 0))
  }

  /** [[syntheticPdf]]'s FILTER-CHAIN twin (l133): the same escaped-
    * literal content stream, armored by doc_id % 4 — 0 =
    * `[/ASCII85Decode /FlateDecode]` (deflate, then base-85 armor: the
    * email-safe chain), 1 = `/ASCIIHexDecode` alone, 2 =
    * `[/ASCIIHexDecode /FlateDecode]`, 3 = `/RunLengthDecode`. The
    * decoders unwrap in listed
    * order, so a round trip certifies the armor decoders AND the
    * chain composition against the construction-side encoders. */
  def syntheticPdfFiltered(docId: Long, text: String): MediaFile = {
    val wrapped = new String(text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      ISO_8859_1)
    val escaped = wrapped.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
    val src = s"BT ($escaped) Tj ET"
    val (data, spec) = (docId % 4) match {
      case 0 => (PdfFixtures.a85Encode(PdfFixtures.deflateStr(src)),
        "/Filter [/ASCII85Decode /FlateDecode]")
      case 1 => (PdfFixtures.hexEncode(src), "/Filter /ASCIIHexDecode")
      case 2 => (PdfFixtures.hexEncode(PdfFixtures.deflateStr(src)),
        "/Filter [/ASCIIHexDecode /FlateDecode]")
      case _ => (PdfFixtures.rleEncode(src), "/Filter /RunLengthDecode")
    }
    MediaFile(docId, PdfFixtures.filteredPdf("1.4", data, spec))
  }

  /** [[syntheticPdf]]'s SIMPLE-FONT-REMAP twin (l138): the text's
    * UTF-8 bytes are written SHIFTED by +2 (mod 256) in one literal
    * string shown through a Type1 font with NO /ToUnicode, whose
    * `/Encoding /Differences` array maps every code back to the
    * original byte — codes whose target is an unambiguous ASCII
    * letter/digit/punct by its Adobe-Glyph-List NAME (certifying the
    * name table), everything else as `uniXXXX` (certifying the AGL
    * hex form). The +2 shift makes ignoring the encoding fail
    * visibly — the raw ISO-8859-1 reading returns shifted garbage.
    * `doc_id % 2` toggles inline vs indirect /Encoding objects,
    * `(doc_id / 2) % 2` the Flate armor. Shifted bytes that are
    * string-delimiters or control bytes are octal-escaped, so the
    * literal round-trips byte-exactly for any input. */
  def syntheticPdfDifferences(docId: Long, text: String): MediaFile = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      val c = ((b & 0xFF) + 2) & 0xFF
      if (c == '(' || c == ')' || c == '\\' || c < 0x20)
        sb.append('\\').append(Integer.toOctalString(c).reverse.padTo(3, '0').reverse)
      else sb.append(c.toChar)
    }
    val diffs = new StringBuilder("0")
    (0 to 255).foreach { code =>
      val target = (code - 2) & 0xFF
      val named =
        if ((target >= 'A' && target <= 'Z') || (target >= 'a' && target <= 'z'))
          Some(target.toChar.toString)
        else if (target >= '0' && target <= '9')
          Some(Seq("zero", "one", "two", "three", "four", "five", "six",
            "seven", "eight", "nine")(target - '0'))
        else None
      diffs.append(" /").append(named.getOrElse(f"uni$target%04X"))
    }
    MediaFile(docId, PdfFixtures.differencesPdf("1.4",
      s"BT /F1 12 Tf (${sb.toString}) Tj ET", diffs.toString,
      flate = (docId / 2) % 2 == 0, indirectEnc = docId % 2 == 0))
  }

  /** The 27 defined cp1252 high-block characters in byte order — the
    * per-document PROBE l146 appends so the WinAnsi table is exercised
    * on EVERY row (a corpus document need not contain smart quotes). */
  private[operators] val WinAnsiProbe: String =
    (0x80 to 0x9F).flatMap(WinAnsiHigh.get).mkString

  private val WinAnsiInv: Map[Int, Int] =
    WinAnsiHigh.map { case (b, s) => s.codePointAt(0) -> b }

  /** [[syntheticPdf]]'s NAMED-BASE-ENCODING twin (l146): the text is
    * projected onto WinAnsi (cp1252) — codepoints outside its image
    * become `?`, exactly `regexp_replace` in the oracle — then encoded
    * through the INVERSE cp1252 table and shown through a simple font
    * whose `/Encoding` is the bare NAME `/WinAnsiEncoding` (even ids)
    * or a dict whose `/Differences [128 /quoteleft 145 /Euro]` SWAPS
    * the two codes over the same `/BaseEncoding` (odd ids, inline or
    * indirect) — construction swaps the bytes to match, so extraction
    * is identical across variants and BOTH the name-only and the
    * base-under-Differences paths are load-bearing. A probe line of
    * all 27 high-block characters rides on every document: ignoring
    * the base encoding extracts C1 controls, ignoring the Differences
    * returns € for ‘ — both fail the oracle visibly. */
  def syntheticPdfBaseEnc(docId: Long, text: String): MediaFile = {
    val swap = docId % 2 == 1
    val sb = new StringBuilder(text.length + 40)
    def enc(s: String): Unit = {
      val it = s.codePoints().iterator()
      while (it.hasNext) {
        val cp = it.next().intValue()
        val b =
          if (cp < 0x80 || (cp >= 0xA0 && cp <= 0xFF)) cp
          else WinAnsiInv.get(cp) match {
            case Some(x) =>
              if (swap && x == 0x80) 0x91
              else if (swap && x == 0x91) 0x80
              else x
            case None => '?'.toInt
          }
        if (b == '(' || b == ')' || b == '\\' || b < 0x20)
          sb.append('\\').append(Integer.toOctalString(b).reverse.padTo(3, '0').reverse)
        else sb.append(b.toChar)
      }
    }
    enc(text); enc("\n" + WinAnsiProbe)
    val encValue =
      if (swap)
        "<< /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
          "/Differences [128 /quoteleft 145 /Euro] >>"
      else "/WinAnsiEncoding"
    MediaFile(docId, PdfFixtures.baseEncPdf("1.4",
      s"BT /F1 12 Tf (${sb.toString}) Tj ET", encValue,
      flate = (docId / 4) % 2 == 0,
      indirectEnc = swap && (docId / 2) % 2 == 0))
  }

  /** [[syntheticPdf]]'s OWNER-LOCKED twin (l136): the same escaped-
    * literal content stream, optionally Flate-filtered, then ENCRYPTED
    * under the standard security handler with an EMPTY user password —
    * the print-driver/scan-appliance shape that is the most common
    * "encrypted" PDF in a real crawl. `doc_id % 5` rotates the handler
    * layout (R2/V1 RC4-40, R3/V2 RC4-128, R4/V4 crypt-filter RC4,
    * R4/V4 AESV2, R6/V5 AESV3 AES-256) and `(doc_id / 4) % 2` the
    * Flate toggle, so every (handler × filter) combination appears
    * across the corpus.
    * The construction derives /O from its own owner password and /U
    * from the derived file key (Alg 3/4/5), so a correct extraction
    * PROVES the reader ran the same public-spec derivation from the
    * parsed dictionary — garbage text (or empty text) fails the
    * oracle visibly. */
  def syntheticPdfEncrypted(docId: Long, text: String): MediaFile = {
    val wrapped = new String(text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      ISO_8859_1)
    val escaped = wrapped.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
    MediaFile(docId, PdfFixtures.encryptedPdf("1.6", s"BT ($escaped) Tj ET",
      flate = (docId / 4) % 2 == 0, handler = (docId % 5).toInt, docId))
  }

  /** The l68-cascade adapter: extracted PDFs as a (id, text) document
    * frame, ready for `Dedup.dedupCorpus` / the quality gates — the
    * "optional PDF ingest stage" in front of the text pipeline. Only
    * real PDF decodes with non-empty text qualify as documents. */
  def asDocuments(files: Dataset[MediaFile], idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    extractText(files).toDF()
      .filter(col("container") === "pdf" && col("n_chars") > 0)
      .select(col("doc_id").as(idCol), col("text").as(textCol))
}
