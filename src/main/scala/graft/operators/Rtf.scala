package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset

import Multimodal.MediaFile

/**
 * RTF text extraction (the Microsoft RTF specification, public — v1.9.1)
 * — the remaining plain-ish document family a crawl delivers next to
 * PDF/Office: word processors and email clients emitted RTF for two
 * decades. The format is a control-word stream:
 *
 *  - `{`/`}` open/close GROUPS; formatting state (and the `\ucN` skip
 *    count) is scoped per group.
 *  - `\word[-]N ` control words: an optional signed numeric parameter,
 *    ONE following space consumed as the delimiter. Unknown words are
 *    formatting — ignored.
 *  - Text-shaping words honored: `\par`/`\line` → `\n`, `\tab` → `\t`,
 *    `\~` (non-breaking space) → space, escaped `\\` `\{` `\}` →
 *    literal, `\'hh` → the cp1252 byte, `\uN` → the UTF-16 unit N
 *    (negative N += 65536 per the signed-16-bit rule), followed by the
 *    current group's `\ucN` fallback characters which are SKIPPED
 *    (default 1).
 *  - DESTINATION groups contribute no text: `{\*\…}` (the ignorable
 *    marker) and the known header destinations (`fonttbl`, `colortbl`,
 *    `stylesheet`, `info`, `pict`, `themedata`, `generator`, …) are
 *    dropped whole.
 *
 * Degradation, never exceptions: no `{\rtf` magic → stub; truncated or
 * malformed input yields the text parsed so far; unbalanced groups
 * close at EOF. Per-row `mapPartitions` work — the same codec-boundary
 * scale posture as every other extractor family.
 */
object Rtf {

  final case class RtfDoc(doc_id: Long, text: String, n_chars: Long,
                          container: String)

  /** Destinations whose content is data/config, not document text. */
  private val SkipDests = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "themedata", "colorschememapping",
    "latentstyles", "datastore", "generator", "xmlnstbl", "filetbl",
    "listtable", "listoverridetable", "revtbl", "rsidtbl", "mmathPr",
    "wgrffmtfilter", "pnseclvl")

  /** Pure text fold over one RTF byte string (ISO-8859-1-decoded —
    * byte-preserving, `\'hh` bytes read back exactly). */
  private[operators] def rtfToText(s: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = s.length
    // group state: (skipDepth>0 → inside a dropped destination), ucN
    var depth = 0
    var skipUntilDepth = Int.MaxValue // depth at which skipping started
    var uc = 1
    val ucStack = scala.collection.mutable.ArrayBuffer[Int]()
    def skipping = depth >= skipUntilDepth
    var pendingUcSkip = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '{') {
        depth += 1; ucStack += uc; i += 1
        // {\*\dest …}: ignorable destination — drop the whole group
        if (!skipping && i + 1 < n && s.charAt(i) == '\\' && s.charAt(i + 1) == '*')
          skipUntilDepth = math.min(skipUntilDepth, depth)
      } else if (c == '}') {
        if (depth == skipUntilDepth) skipUntilDepth = Int.MaxValue
        depth = math.max(0, depth - 1)
        uc = if (ucStack.nonEmpty) { val v = ucStack.remove(ucStack.length - 1); v } else 1
        i += 1
      } else if (c == '\\') {
        if (i + 1 >= n) i = n
        else {
          val d = s.charAt(i + 1)
          if (d == '\\' || d == '{' || d == '}') {
            if (!skipping) { if (pendingUcSkip > 0) pendingUcSkip -= 1 else out.append(d) }
            i += 2
          } else if (d == '\'') {
            if (i + 4 <= n) {
              val v = try Integer.parseInt(s.substring(i + 2, i + 4), 16)
                catch { case _: NumberFormatException => -1 }
              if (!skipping && v >= 0) {
                if (pendingUcSkip > 0) pendingUcSkip -= 1
                else out.append(v.toChar) // cp1252 ⊂ the byte-preserving read
              }
              i += 4
            } else i = n
          } else if (d == '~') { // non-breaking space
            if (!skipping) out.append(' ')
            i += 2
          } else if (Character.isLetter(d)) {
            // control word: letters, optional signed int param, one
            // optional delimiter space
            var j = i + 1
            while (j < n && Character.isLetter(s.charAt(j))) j += 1
            val word = s.substring(i + 1, j)
            var param = Int.MinValue
            if (j < n && (s.charAt(j) == '-' || Character.isDigit(s.charAt(j)))) {
              val neg = s.charAt(j) == '-'
              var k = if (neg) j + 1 else j
              var v = 0L
              while (k < n && Character.isDigit(s.charAt(k)) && v < 1000000L) {
                v = v * 10 + (s.charAt(k) - '0'); k += 1
              }
              param = (if (neg) -v else v).toInt
              j = k
            }
            if (j < n && s.charAt(j) == ' ') j += 1 // the delimiter space
            word match {
              case _ if skipping => ()
              // \par IS the paragraph mark — 1:1 with '\n', no
              // deduplication (consecutive \par = consecutive blank
              // lines, and the round trip must preserve them)
              case "par" | "line" | "sect" | "page" => out.append('\n')
              case "tab" => out.append('\t')
              case "emdash" => out.append('—')
              case "endash" => out.append('–')
              case "lquote" => out.append('‘')
              case "rquote" => out.append('’')
              case "ldblquote" => out.append('“')
              case "rdblquote" => out.append('”')
              case "bullet" => out.append('•')
              case "uc" => uc = math.max(0, if (param == Int.MinValue) 1 else param)
              case "u" =>
                // a \u escape is never itself "fallback data" — only
                // plain chars and \'hh after it are skipped (spec: the
                // \ucN count applies to the substitute text)
                if (param != Int.MinValue) {
                  val unit = if (param < 0) param + 65536 else param
                  out.append((unit & 0xFFFF).toChar)
                  pendingUcSkip = uc
                }
              case w if SkipDests.contains(w) =>
                skipUntilDepth = math.min(skipUntilDepth, depth)
              case _ => () // unknown control word: formatting, ignored
            }
            i = j
          } else i += 2 // \<other symbol>: ignored control symbol
        }
      } else if (c == '\r' || c == '\n') i += 1 // raw EOLs are ignorable
      else {
        if (!skipping) { if (pendingUcSkip > 0) pendingUcSkip -= 1 else out.append(c) }
        i += 1
      }
    }
    out.toString
  }

  /** Full-document extraction; None when the `{\rtf` magic is absent. */
  def parseRtfText(m: MediaFile): Option[RtfDoc] = {
    val s = new String(m.payload, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) None
    else {
      val text = try rtfToText(s) catch { case NonFatal(_) => "" }
      Some(RtfDoc(m.doc_id, text, text.length.toLong, "rtf"))
    }
  }

  def decodeRtfText(m: MediaFile): RtfDoc =
    parseRtfText(m).getOrElse(RtfDoc(m.doc_id, "", 0L, "stub"))

  /** [[PdfText.extractText]]'s RTF twin at the same codec boundary. */
  def extractText(files: Dataset[MediaFile]): Dataset[RtfDoc] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeRtfText))
  }

  /** The l68-cascade adapter ([[PdfText.asDocuments]]'s twin). */
  def asDocuments(files: Dataset[MediaFile], idCol: String = "doc_id",
                  textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    extractText(files).toDF()
      .filter(col("container") === "rtf" && col("n_chars") > 0)
      .select(col("doc_id").as(idCol), col("text").as(textCol))
  }

  /** The l142 construction half: wrap a document's text into a real
    * RTF file — header with a font table the walk must DROP (its
    * "Arial;" must not leak into the text), the body escaping `{`/`}`/
    * `\`, `\n` as `\par`, `\t` as `\tab`; non-ASCII characters rotate
    * by doc_id between `\uN?` (with a `?` fallback the `\uc1` skip
    * must eat — emitting it reads back visibly wrong) and, when the
    * unit fits a byte, `\'hh`; an `{\*\generator …}` ignorable group
    * is planted mid-body so destination skipping is load-bearing. */
  def syntheticRtf(docId: Long, text: String): MediaFile = {
    val sb = new StringBuilder(text.length * 2 + 128)
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1")
    sb.append("{\\fonttbl{\\f0\\fswiss Arial;}}")
    sb.append("{\\*\\generator graft 17.0;}")
    sb.append("\\f0\\fs24 ")
    var emitted = 0
    text.foreach { ch =>
      if (emitted == (text.length / 2) && text.length > 3)
        sb.append("{\\*\\themedata 0f0e0d;}") // mid-body ignorable group
      emitted += 1
      ch match {
        case '\\' => sb.append("\\\\")
        case '{' => sb.append("\\{")
        case '}' => sb.append("\\}")
        case '\n' => sb.append("\\par ")
        case '\t' => sb.append("\\tab ")
        case c if c < 0x80 => sb.append(c)
        case c if c < 0x100 && (docId + emitted) % 2 == 0 =>
          sb.append(f"\\'${c.toInt}%02x")
        case c =>
          val v = c.toInt
          sb.append("\\u").append(if (v > 32767) v - 65536 else v).append('?')
      }
    }
    sb.append("}")
    MediaFile(docId, sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
  }
}
