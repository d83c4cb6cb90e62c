package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import Multimodal.MediaFile

/**
 * DOCX / XLSX / PPTX / EPUB container metadata — the remaining big
 * document family next to WARC (l50), images (l13), audio (l61), video
 * (l83) and PDF (l112/l113). All four formats are ZIP containers
 * (PKWARE APPNOTE, public)
 * around XML: the walk here reads the zip END-OF-CENTRAL-DIRECTORY
 * record and central directory (never trusting sequential local
 * headers — the CD is the authoritative index, and it is how encrypted
 * or data-descriptor entries are visible without decoding them), then
 * extracts the structural fields a corpus curator gates on:
 *
 *  - `format`: "docx" (has `word/document.xml`), "epub" (has
 *    `META-INF/container.xml` or an `application/epub+zip` mimetype
 *    entry), else "zip" for any other readable archive; non-zip
 *    payloads take the deterministic stub (malformed input is data).
 *  - `n_entries`: central-directory entry count.
 *  - `encrypted`: any entry's general-purpose flag bit 0 (classic zip
 *    crypto / AE-x) OR an `META-INF/encryption.xml` entry (EPUB DRM).
 *    Encrypted documents report EMPTY content fields — ciphertext is
 *    not text, the l113 contract.
 *  - DOCX: `n_words` = whitespace-run tokens of the document text,
 *    where paragraph text is the CONCATENATION of its `<w:t>` runs
 *    (runs split words arbitrarily — "Alp" + "ha" is one word; the
 *    construction fixtures prove the concat) with XML entities
 *    decoded; `n_parts` = paragraph (`<w:p`) count; `title` /
 *    `language` from `docProps/core.xml` Dublin Core fields.
 *  - XLSX: sheets resolve in WORKBOOK order (`xl/workbook.xml`'s
 *    `<sheet r:id>` list through `xl/_rels/workbook.xml.rels` — the
 *    OPC indirection real writers use; numeric-filename fallback when
 *    either is missing). Per sheet, each `<row>`'s non-empty cell
 *    texts join with a TAB and rows/sheets join with `\n`; a cell's
 *    text is the shared-string entry (`t="s"` → `<v>` index into
 *    `xl/sharedStrings.xml`, each `<si>`'s `<t>` runs concatenated —
 *    rich-text runs split words like DOCX runs), the inline string
 *    (`t="inlineStr"`), or the raw `<v>` value (numbers, formula
 *    results). `n_parts` = sheet count; `n_words` over the text.
 *  - PPTX: slides resolve in PRESENTATION order (`<p:sldId r:id>`
 *    through `ppt/_rels/presentation.xml.rels`; numeric fallback).
 *    Per slide, each `<a:p>` paragraph is its `<a:t>` runs
 *    concatenated; paragraphs and slides join with `\n`. `n_parts` =
 *    slide count; `n_words` over the text. Titles/languages for both
 *    from `docProps/core.xml`, same as DOCX.
 *  - ODT (OpenDocument Text, the LibreOffice family; OASIS spec):
 *    detected by the `mimetype` member's
 *    `application/vnd.oasis.opendocument.text`. Paragraphs are
 *    `content.xml`'s `<text:p>`/`<text:h>` blocks with `<text:tab/>`
 *    → TAB, `<text:s/>` → one space, remaining inline tags (spans)
 *    stripped to nothing (inline elements concatenate — the ODF
 *    reading), entities decoded, joined with `\n`. `n_parts` =
 *    paragraph count; `title`/`language` from `meta.xml`'s Dublin
 *    Core fields.
 *  - EPUB: `title` / `language` from the OPF package document located
 *    via `META-INF/container.xml`'s rootfile full-path; `n_parts` =
 *    spine `<itemref` count (reading-order length — the page-count
 *    analogue); `n_words` = whitespace-run tokens of the spine
 *    chapters' stripped prose (the l120 extraction wired into the
 *    metadata readout — the meta path pays per-chapter inflation
 *    because the word count is chapter content).
 *
 * Stored (method 0) and Deflate (method 8) entries both read; raw
 * deflate inflates via `java.util.zip.Inflater(nowrap)` with the same
 * 64 MiB zip-bomb cap as [[PdfText]]. Every malformed shape degrades
 * (wrong magic → stub; zip magic without a readable EOCD/CD → "zip"
 * with zeroed fields) and never throws.
 *
 * Scale: the same `mapPartitions` codec boundary as every media
 * decode — payloads never touch the driver; output rows are small
 * scalars + short strings so the binary column prunes immediately.
 */
object OfficeZip {

  /** Extracted container metadata. */
  final case class OfficeMeta(doc_id: Long, byte_len: Long, format: String,
                              n_entries: Long, encrypted: Boolean,
                              n_words: Long, n_parts: Long,
                              title: String, language: String,
                              container: String)

  /** One central-directory row. Sizes/offsets resolve through the
    * zip64 extended-information extra field (id 0x0001) when the
    * classic u32 fields carry the 0xFFFFFFFF sentinel — PKWARE APPNOTE
    * §4.5.3 — so ≥4 GiB members and ≥65,535-entry directories WALK;
    * materializing a single >2 GiB member still degrades to None in
    * [[entryBytes]] (a JVM byte array cannot hold it — the stated cap,
    * structure reads regardless). */
  private[graft] final case class ZipEntry(name: String, method: Int,
                                               flag: Int, compSize: Long,
                                               uncompSize: Long, localOff: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def u64(b: Array[Byte], i: Int): Long =
    u32(b, i) | (u32(b, i + 4) << 32)

  private def sigAt(b: Array[Byte], i: Int, s3: Int, s4: Int): Boolean =
    b(i) == 0x50 && b(i + 1) == 0x4B && (b(i + 2) & 0xFF) == s3 && (b(i + 3) & 0xFF) == s4

  private val U32Max = 0xFFFFFFFFL

  /** Central directory via the EOCD record (scanned backwards over the
    * final 64 KiB + 22 comment window, the spec's bound). When the
    * classic record carries the zip64 sentinels (0xFFFF entries /
    * 0xFFFFFFFF offset), the count and offset resolve through the
    * zip64 EOCD LOCATOR (sig PK\x06\x07, 20 bytes immediately before
    * the classic EOCD) into the zip64 EOCD RECORD (sig PK\x06\x06) —
    * PKWARE APPNOTE §4.3.14–15. None when no EOCD resolves or the
    * directory does not parse; corrupt zip64 pointers degrade to the
    * classic fields' conservative reading. */
  private[graft] def centralDirectory(b: Array[Byte]): Option[Seq[ZipEntry]] = {
    if (b.length < 22) return None
    var i = b.length - 22
    val lo = math.max(0, b.length - 22 - 65535)
    var eocd = -1
    while (i >= lo && eocd < 0) {
      if (sigAt(b, i, 0x05, 0x06)) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    var n: Long = u16(b, eocd + 10)
    var cdOff: Long = u32(b, eocd + 16)
    if ((n == 0xFFFFL || cdOff == U32Max) && eocd >= 20 &&
        sigAt(b, eocd - 20, 0x06, 0x07)) {
      val z64 = u64(b, eocd - 20 + 8) // offset of the zip64 EOCD record
      if (z64 >= 0 && z64 + 56 <= b.length && sigAt(b, z64.toInt, 0x06, 0x06)) {
        n = u64(b, z64.toInt + 32)     // total entries
        cdOff = u64(b, z64.toInt + 48) // central directory offset
      }
    }
    if (cdOff < 0 || cdOff > b.length - 4) return None
    val out = Seq.newBuilder[ZipEntry]
    var p = cdOff.toInt
    var k = 0L
    while (k < n) {
      if (p + 46 > b.length || !sigAt(b, p, 0x01, 0x02)) return Some(out.result())
      val flag = u16(b, p + 8)
      val method = u16(b, p + 10)
      var comp = u32(b, p + 20)
      var uncomp = u32(b, p + 24)
      val nameLen = u16(b, p + 28)
      val extraLen = u16(b, p + 30)
      val commentLen = u16(b, p + 32)
      var localOff = u32(b, p + 42)
      if (p + 46 + nameLen > b.length) return Some(out.result())
      val name = new String(b, p + 46, nameLen, UTF_8)
      // zip64 extended information (extra id 0x0001): u64 values present
      // ONLY for the classic fields carrying the sentinel, in the fixed
      // order uncompressed / compressed / local-header offset (§4.5.3)
      if ((comp == U32Max || uncomp == U32Max || localOff == U32Max) &&
          extraLen >= 4) {
        var e = p + 46 + nameLen
        val eEnd = math.min(e + extraLen, b.length - 3)
        var found = false
        while (!found && e + 4 <= eEnd) {
          val id = u16(b, e)
          val sz = u16(b, e + 2)
          if (id == 0x0001) {
            found = true
            var f = e + 4
            val fEnd = math.min(e + 4 + sz, b.length - 7)
            if (uncomp == U32Max && f + 8 <= fEnd) { uncomp = u64(b, f); f += 8 }
            if (comp == U32Max && f + 8 <= fEnd) { comp = u64(b, f); f += 8 }
            if (localOff == U32Max && f + 8 <= fEnd) { localOff = u64(b, f); f += 8 }
          } else e += 4 + sz
        }
      }
      out += ZipEntry(name, method, flag, comp, uncomp, localOff)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.result())
  }

  /** Entry payload via its LOCAL header (name/extra lengths re-read
    * there — they can differ from the CD). None for encrypted entries,
    * unknown methods, or out-of-bounds shapes. */
  private[graft] def entryBytes(b: Array[Byte], e: ZipEntry): Option[Array[Byte]] = {
    if ((e.flag & 1) != 0) return None // encrypted: visible, not readable
    if (e.localOff < 0 || e.localOff + 30 > b.length) return None // Long-checked pre-narrow
    val off = e.localOff.toInt
    if (!sigAt(b, off, 0x03, 0x04)) return None
    val nameLen = u16(b, off + 26)
    val extraLen = u16(b, off + 28)
    // bounds arithmetic in Long BEFORE narrowing — a crafted central
    // directory with compSize just under 2^31 would overflow Int and
    // slip a negative `end` past the length check
    val startL = off + 30L + nameLen + extraLen
    val endL = startL + e.compSize
    if (startL < 0 || endL > b.length || e.compSize > Int.MaxValue) return None
    val start = startL.toInt
    val end = endL.toInt
    e.method match {
      case 0 => Some(java.util.Arrays.copyOfRange(b, start, end))
      case 8 => // raw deflate — the shared capped inflate (PdfText)
        PdfText.inflateBytes(b, start, end - start, nowrap = true,
          sizeHint = e.uncompSize.toInt)
      case _ => None // stored + deflate cover real DOCX/EPUB writers
    }
  }

  private def entryText(b: Array[Byte], entries: Seq[ZipEntry], name: String): Option[String] =
    entries.find(_.name == name).flatMap(entryBytes(b, _)).map(new String(_, UTF_8))

  /** The five predefined XML entities (the only ones well-formed OOXML
    * may carry without a DTD). */
  private[operators] def unescapeXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  private val WT = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>".r
  private val WP = "<w:p[ >/]".r
  private val DcTitle = "(?s)<dc:title(?:\\s[^>]*)?>(.*?)</dc:title>".r
  private val DcLanguage = "(?s)<dc:language(?:\\s[^>]*)?>(.*?)</dc:language>".r
  private val RootFile = "full-path\\s*=\\s*\"([^\"]+)\"".r
  private val ItemRef = "<itemref[\\s/>]".r

  private def wsWords(s: String): Long =
    s.split("[ \n\t\r]+").count(_.nonEmpty).toLong

  /** Paragraph texts of a `word/document.xml` body — each paragraph
    * the CONCATENATION of its `<w:t>` runs (runs split words
    * arbitrarily; concatenation is the OOXML reading) interleaved with
    * the run-level whitespace ELEMENTS real Word files carry: an
    * attribute-LESS `<w:tab/>` is a tab character (the attributed form
    * inside `<w:tabs>` is a tab-STOP definition and must emit
    * nothing), `<w:br/>` (any attrs — page breaks break text too) and
    * `<w:cr/>` are line breaks. Entities decoded per run. */
  private val WtOrBreak =
    ("(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:tab\\s*/>|" +
      "<w:br\\b[^>]*/>|<w:cr\\s*/>").r

  private def docxParagraphsOf(doc: String): Seq[String] =
    doc.split("<w:p[ >]").iterator.map { chunk =>
      val sb = new StringBuilder
      WtOrBreak.findAllMatchIn(chunk).foreach { m =>
        if (m.group(1) != null) sb.append(unescapeXml(m.group(1)))
        else if (m.matched.startsWith("<w:tab")) sb.append('\t')
        else sb.append('\n')
      }
      sb.toString
    }.filter(_.nonEmpty).toSeq

  // ------------------------------------------------- xlsx / pptx parts

  private val TRun = "(?s)<t(?:\\s[^>]*)?>(.*?)</t>".r
  private val SiBlock = "(?s)<si(?:\\s[^>]*)?>(.*?)</si>".r
  private val CellBlock = "(?s)<c\\b([^>]*?)(?:/>|>(.*?)</c>)".r
  private val CellType = "\\bt\\s*=\\s*\"([^\"]*)\"".r
  private val VVal = "(?s)<v(?:\\s[^>]*)?>(.*?)</v>".r
  private val SheetTag = "<sheet\\b[^>]*>".r
  private val AttrRid = "\\br:id\\s*=\\s*\"([^\"]*)\"".r
  private val RelTag = "<Relationship\\b[^>]*>".r
  private val AttrRelId = "\\bId\\s*=\\s*\"([^\"]*)\"".r
  private val AttrTarget = "\\bTarget\\s*=\\s*\"([^\"]*)\"".r
  private val SldIdTag = "<p:sldId\\b[^>]*>".r
  private val AParagraph = "(?s)<a:p(?:\\s[^>]*)?>(.*?)</a:p>".r
  private val ATRun = "(?s)<a:t(?:\\s[^>]*)?>(.*?)</a:t>".r
  private val NumberedPart = "(\\D*?)(\\d+)\\.xml$".r

  /** OPC relationship resolution: the part NAMES a relationship id
    * (`r:id` in workbook.xml / presentation.xml), the `.rels` sibling
    * maps ids to targets relative to the source part's directory.
    * Returns ordered member names; when the rels part or every r:id is
    * missing (hand-rolled containers), falls back to the numeric-
    * filename order of members under `fallbackPrefix`. */
  private def resolveOrderedParts(b: Array[Byte], entries: Seq[ZipEntry],
                                  tagIds: Seq[String],
                                  relsName: String, baseDir: String,
                                  fallbackPrefix: String): Seq[String] = {
    val rels = entryText(b, entries, relsName).getOrElse("")
    val targetById = RelTag.findAllIn(rels).flatMap { rel =>
      for (id <- AttrRelId.findFirstMatchIn(rel).map(_.group(1));
           t <- AttrTarget.findFirstMatchIn(rel).map(_.group(1)))
        yield id -> (if (t.startsWith("/")) t.substring(1) else baseDir + t)
    }.toMap
    val resolved = tagIds.flatMap(targetById.get)
    if (resolved.nonEmpty) resolved
    else entries.map(_.name)
      .filter(n => n.startsWith(fallbackPrefix) && n.endsWith(".xml"))
      .flatMap { n =>
        NumberedPart.findFirstMatchIn(n.substring(fallbackPrefix.length))
          .map(m => (m.group(2).toLong, n))
      }.sortBy(_._1).map(_._2)
  }

  /** Worksheet rows as text lines: per `<row>`, the non-empty cell
    * texts joined with a TAB; rows with no text dropped. */
  private def sheetLines(sheet: String, shared: IndexedSeq[String]): Seq[String] =
    sheet.split("<row[ >]").iterator.drop(1).map { chunk =>
      CellBlock.findAllMatchIn(chunk).map { c =>
        val attrs = c.group(1)
        val inner = Option(c.group(2)).getOrElse("")
        CellType.findFirstMatchIn(attrs).map(_.group(1)) match {
          case Some("s") =>
            VVal.findFirstMatchIn(inner).map(_.group(1).trim)
              .flatMap(_.toIntOption).filter(i => i >= 0 && i < shared.length)
              .map(shared).getOrElse("")
          case Some("inlineStr") =>
            TRun.findAllMatchIn(inner).map(m => unescapeXml(m.group(1))).mkString
          case _ => // numeric, t="str" formula results, booleans: raw <v>
            VVal.findFirstMatchIn(inner).map(m => unescapeXml(m.group(1))).getOrElse("")
        }
      }.filter(_.nonEmpty).mkString("\t")
    }.filter(_.nonEmpty).toSeq

  private val OdtParagraph = "(?s)<text:(?:p|h)(?:\\s[^>]*)?>(.*?)</text:(?:p|h)>".r
  // \b[^>]* admits the attributed form (<text:tab text:tab-ref="…"/>,
  // legal ODF) — unlike w:tab, text:tab is ALWAYS a tab character (tab
  // stops live in styles, not inline), so attributes never change the
  // substitution; without this the attributed form fell through to
  // AnyTagEmpty and fused the words on either side
  private val OdtTab = "<text:tab\\b[^>]*/>".r
  private val OdtBreak = "<text:line-break\\s*/>".r
  private val OdtSpace = "<text:s\\b[^>]*/>".r
  private val AnyTagEmpty = "<[^>]*>".r

  /** ODT paragraph texts of a `content.xml` body: `<text:p>`/`<text:h>`
    * blocks, tab/line-break/space elements substituted, inline tags
    * stripped to
    * NOTHING (spans concatenate), entities decoded. */
  private def odtParagraphsOf(content: String): Seq[String] =
    OdtParagraph.findAllMatchIn(content).map { m =>
      val tabs = OdtTab.replaceAllIn(m.group(1), "\t")
      val broken = OdtBreak.replaceAllIn(tabs, "\n")
      val spaced = OdtSpace.replaceAllIn(broken, " ")
      unescapeXml(AnyTagEmpty.replaceAllIn(spaced, ""))
    }.filter(_.nonEmpty).toSeq

  /** XLSX text: sheets in workbook order, rows as [[sheetLines]]. */
  private def xlsxText(b: Array[Byte], entries: Seq[ZipEntry]): String = {
    val workbook = entryText(b, entries, "xl/workbook.xml").getOrElse("")
    val shared = entryText(b, entries, "xl/sharedStrings.xml").map { ss =>
      SiBlock.findAllMatchIn(ss).map(si =>
        TRun.findAllMatchIn(si.group(1)).map(m => unescapeXml(m.group(1))).mkString)
        .toIndexedSeq
    }.getOrElse(IndexedSeq.empty)
    val rids = SheetTag.findAllIn(workbook)
      .flatMap(t => AttrRid.findFirstMatchIn(t).map(_.group(1))).toSeq
    resolveOrderedParts(b, entries, rids,
        "xl/_rels/workbook.xml.rels", "xl/", "xl/worksheets/sheet")
      .flatMap(name => entryText(b, entries, name))
      .flatMap(sheetLines(_, shared))
      .mkString("\n")
  }

  /** PPTX text: slides in presentation order, per slide the `<a:p>`
    * paragraphs' concatenated `<a:t>` runs. */
  private def pptxText(b: Array[Byte], entries: Seq[ZipEntry]): String = {
    val pres = entryText(b, entries, "ppt/presentation.xml").getOrElse("")
    val rids = SldIdTag.findAllIn(pres)
      .flatMap(t => AttrRid.findFirstMatchIn(t).map(_.group(1))).toSeq
    resolveOrderedParts(b, entries, rids,
        "ppt/_rels/presentation.xml.rels", "ppt/", "ppt/slides/slide")
      .flatMap(name => entryText(b, entries, name))
      .flatMap(slide => AParagraph.findAllMatchIn(slide).map(p =>
        ATRun.findAllMatchIn(p.group(1)).map(m => unescapeXml(m.group(1))).mkString))
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /**
   * The single decode pass behind BOTH readouts: metadata always
   * (which for document formats includes the body — n_words counts
   * it), the text string materialized into the result only when
   * `withText`. Each member is located and inflated ONCE — the
   * meta/text split previously re-walked the central directory and
   * re-read `word/document.xml` per readout.
   */
  private def parseOfficeFull(m: MediaFile, withText: Boolean): Option[(OfficeMeta, String)] = {
    val b = m.payload
    if (b.length < 4 || !sigAt(b, 0, 0x03, 0x04)) return None
    val bl = b.length.toLong
    def degraded = (OfficeMeta(m.doc_id, bl, "zip", 0L, encrypted = false,
      0L, 0L, "", "", container = "zip"), "")
    try {
      centralDirectory(b) match {
        case None =>
          // zip magic but no readable directory: a truncated download
          Some(degraded)
        case Some(entries) =>
          val names = entries.map(_.name).toSet
          val enc = entries.exists(e => (e.flag & 1) != 0) ||
            names.contains("META-INF/encryption.xml")
          lazy val mimetype = entryText(b, entries, "mimetype").map(_.trim)
          val format =
            if (names.contains("word/document.xml")) "docx"
            else if (names.contains("xl/workbook.xml")) "xlsx"
            else if (names.contains("ppt/presentation.xml")) "pptx"
            else if (mimetype.contains("application/vnd.oasis.opendocument.text"))
              "odt"
            else if (names.contains("META-INF/container.xml") ||
              mimetype.contains("application/epub+zip"))
              "epub"
            else "zip"
          def coreField(re: scala.util.matching.Regex): String = {
            val core = entryText(b, entries, "docProps/core.xml").getOrElse("")
            re.findFirstMatchIn(core).map(x => unescapeXml(x.group(1))).getOrElse("")
          }
          val (nWords, nParts, title, lang, text) =
            if (enc) (0L, 0L, "", "", "") // ciphertext is not content
            else format match {
              case "docx" =>
                val doc = entryText(b, entries, "word/document.xml").getOrElse("")
                val body = docxParagraphsOf(doc).mkString("\n")
                (wsWords(body), WP.findAllMatchIn(doc).length.toLong,
                  coreField(DcTitle), coreField(DcLanguage),
                  if (withText) body else "")
              case "xlsx" =>
                val workbook = entryText(b, entries, "xl/workbook.xml").getOrElse("")
                val body = xlsxText(b, entries)
                (wsWords(body), SheetTag.findAllIn(workbook).length.toLong,
                  coreField(DcTitle), coreField(DcLanguage),
                  if (withText) body else "")
              case "odt" =>
                val content = entryText(b, entries, "content.xml").getOrElse("")
                val meta = entryText(b, entries, "meta.xml").getOrElse("")
                val paras = odtParagraphsOf(content)
                val body = paras.mkString("\n")
                (wsWords(body), paras.length.toLong,
                  DcTitle.findFirstMatchIn(meta).map(x => unescapeXml(x.group(1))).getOrElse(""),
                  DcLanguage.findFirstMatchIn(meta).map(x => unescapeXml(x.group(1))).getOrElse(""),
                  if (withText) body else "")
              case "pptx" =>
                val pres = entryText(b, entries, "ppt/presentation.xml").getOrElse("")
                val declared = SldIdTag.findAllIn(pres).length.toLong
                val nSlides = // declared list; numbered members when absent
                  if (declared > 0) declared
                  else entries.count(e => e.name.startsWith("ppt/slides/slide") &&
                    e.name.endsWith(".xml")).toLong
                val body = pptxText(b, entries)
                (wsWords(body), nSlides,
                  coreField(DcTitle), coreField(DcLanguage),
                  if (withText) body else "")
              case "epub" =>
                val container = entryText(b, entries, "META-INF/container.xml").getOrElse("")
                val opfPath = RootFile.findFirstMatchIn(container).map(_.group(1))
                val opf = opfPath.flatMap(p => entryText(b, entries, p)).getOrElse("")
                val opfDir = opfPath.map { p =>
                  val cut = p.lastIndexOf('/')
                  if (cut < 0) "" else p.substring(0, cut + 1)
                }.getOrElse("")
                // n_words now counts the spine chapters' stripped prose
                // (the former n_words=0 limit, closed by the l120
                // extraction) — the meta readout pays the per-chapter
                // inflation because the word count IS chapter content
                val body = epubChapters(b, entries, opf, opfDir).mkString("\n")
                (wsWords(body), ItemRef.findAllMatchIn(opf).length.toLong,
                  DcTitle.findFirstMatchIn(opf).map(x => unescapeXml(x.group(1))).getOrElse(""),
                  DcLanguage.findFirstMatchIn(opf).map(x => unescapeXml(x.group(1))).getOrElse(""),
                  if (withText) body else "")
              case _ => (0L, 0L, "", "", "")
            }
          Some((OfficeMeta(m.doc_id, bl, format, entries.length.toLong, enc,
            nWords, nParts, title, lang, container = "zip"), text))
      }
    } catch {
      case NonFatal(_) => Some(degraded)
    }
  }

  /** Full metadata decode; None when the payload has no zip magic. */
  def parseOffice(m: MediaFile): Option[OfficeMeta] =
    parseOfficeFull(m, withText = false).map(_._1)

  // ------------------------------------------------------ text payload

  /** Extracted document text (the l113 twin for office containers).
    * `text` = DOCX paragraphs joined by `\n`, XLSX workbook-ordered
    * sheet rows (cells TAB-joined), PPTX presentation-ordered slide
    * paragraphs, or EPUB spine chapters (each XHTML stripped to prose)
    * joined by `\n`; encrypted documents and non-document zips
    * report "". */
  final case class OfficeText(doc_id: Long, format: String, text: String,
                              n_chars: Long, container: String)

  /** XHTML→prose for EPUB chapters: drop script/style blocks, strip
    * tags to spaces, decode the predefined entities, collapse
    * whitespace runs — the driver-side mirror of the
    * `TextFunctions.htmlToText` chain's tail, compact enough to run
    * inside the decode `mapPartitions`. */
  private val ScriptBlock = "(?is)<script[^>]*>.*?</script>".r
  private val StyleBlock = "(?is)<style[^>]*>.*?</style>".r
  private val AnyTag = "<[^>]*>".r
  private val WsRun = "[ \n\t\r]+".r

  private[operators] def stripXhtml(html: String): String = {
    val noScript = ScriptBlock.replaceAllIn(html, " ")
    val noStyle = StyleBlock.replaceAllIn(noScript, " ")
    val noTags = AnyTag.replaceAllIn(noStyle, " ")
    WsRun.replaceAllIn(unescapeXml(noTags), " ").trim
  }

  // [^>]* already spans a self-closing tag's trailing '/', so one
  // alternative covers <item …> and <item …/>
  private val ManifestItem = "<item\\b[^>]*>".r
  private val AttrId = "\\bid\\s*=\\s*\"([^\"]*)\"".r
  private val AttrHref = "\\bhref\\s*=\\s*\"([^\"]*)\"".r
  private val SpineIdref = "<itemref\\b[^>]*\\bidref\\s*=\\s*\"([^\"]*)\"".r

  /** EPUB chapter texts in SPINE order over an already-located OPF:
    * manifest (id → href, resolved relative to the OPF's directory) →
    * spine idrefs; each resolvable chapter entry strips to prose.
    * Missing manifest ids / absent entries contribute nothing. */
  private def epubChapters(b: Array[Byte], entries: Seq[ZipEntry],
                           opf: String, opfDir: String): Seq[String] = {
    val hrefById = ManifestItem.findAllIn(opf).map { item =>
      (AttrId.findFirstMatchIn(item).map(_.group(1)),
        AttrHref.findFirstMatchIn(item).map(_.group(1)))
    }.collect { case (Some(id), Some(href)) => (id, href) }.toMap
    SpineIdref.findAllMatchIn(opf).map(_.group(1)).toSeq
      .flatMap(hrefById.get)
      .flatMap(href => entryText(b, entries, opfDir + href))
      .map(stripXhtml)
      .filter(_.nonEmpty)
  }

  /** Full text extraction; None when the payload has no zip magic. */
  def parseOfficeText(m: MediaFile): Option[OfficeText] =
    parseOfficeFull(m, withText = true).map { case (meta, text) =>
      OfficeText(m.doc_id, meta.format, text, text.length.toLong, meta.container)
    }

  /** Stub fallback mirroring [[decodeOffice]]'s tagging. */
  def decodeOfficeText(m: MediaFile): OfficeText =
    parseOfficeText(m).getOrElse(
      OfficeText(m.doc_id, "stub", "", 0L, container = "stub"))

  /** [[PdfText.extractText]]'s office twin at the same `mapPartitions`
    * boundary. */
  def extractText(files: Dataset[MediaFile]): Dataset[OfficeText] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeOfficeText))
  }

  /** The l68-cascade adapter ([[PdfText.asDocuments]]'s twin): real
    * document formats with non-empty text as an (id, text) frame. */
  def asDocuments(files: Dataset[MediaFile], idCol: String = "doc_id",
                  textCol: String = "text"): org.apache.spark.sql.DataFrame =
    extractText(files).toDF()
      .filter(col("format").isin("docx", "xlsx", "pptx", "odt", "epub") &&
        col("n_chars") > 0)
      .select(col("doc_id").as(idCol), col("text").as(textCol))

  /** Construction half of the corpus-scale ROUND-TRIP certification
    * (l122, the l121 twin): wrap a document's text into a minimal DOCX
    * whose single paragraph is split across TWO `<w:t>` runs at the
    * midpoint — so the extractor's run concatenation is load-bearing
    * on every row — with the XML-reserved characters entity-escaped
    * per run. Members carry UTF-8 directly (zip payloads are bytes),
    * so any unicode text round-trips; Deflate on even ids exercises
    * the inflate path on half the corpus. */
  def syntheticDocx(docId: Long, text: String): MediaFile = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    var cut = text.length / 2
    if (cut > 0 && cut < text.length && Character.isLowSurrogate(text.charAt(cut)))
      cut -= 1 // never split a surrogate pair across runs
    val (r1, r2) = (esc(text.substring(0, cut)), esc(text.substring(cut)))
    val doc = "<?xml version=\"1.0\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
      s"<w:p><w:r><w:t xml:space=\"preserve\">$r1</w:t></w:r>" +
      s"<w:r><w:t xml:space=\"preserve\">$r2</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    MediaFile(docId, OfficeFixtures.buildSyntheticDocx(doc, docId % 2 == 0))
  }

  /** Construction half of the EPUB round trip (l124, completing the
    * PDF/DOCX/EPUB triptych): wrap a document's text into a one-chapter
    * EPUB (entity-escaped `<p>` body, Deflate on even ids). Unlike the
    * byte-exact l121/l122, EPUB extraction goes through [[stripXhtml]]
    * — a whitespace-COLLAPSING prose strip — so the round-trip
    * invariant is `trim(collapse-ws(text))`, which the oracle restates
    * with the same dialect-neutral character class. */
  def syntheticEpub(docId: Long, text: String): MediaFile = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    MediaFile(docId, OfficeFixtures.buildSyntheticEpub(
      s"<html><body><p>${esc(text)}</p></body></html>", docId % 2 == 0))
  }

  /** Construction half of the XLSX round trip (l131): the document's
    * text as ONE shared string split across TWO `<t>` rich-text runs
    * at the midpoint (run concatenation load-bearing, the l122
    * discipline), referenced by a single `t="s"` cell whose sheet
    * resolves through a REAL rels indirection (`r:id` → rels target) —
    * so the round trip certifies the OPC resolution chain, the
    * shared-string table, and the cell-type dispatch on every row.
    * Deflate on even ids. */
  def syntheticXlsx(docId: Long, text: String): MediaFile = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    var cut = text.length / 2
    if (cut > 0 && cut < text.length && Character.isLowSurrogate(text.charAt(cut)))
      cut -= 1
    val (r1, r2) = (esc(text.substring(0, cut)), esc(text.substring(cut)))
    val sharedStrings = "<?xml version=\"1.0\"?><sst count=\"1\" uniqueCount=\"1\">" +
      s"<si><r><t xml:space=\"preserve\">$r1</t></r>" +
      s"<r><t xml:space=\"preserve\">$r2</t></r></si></sst>"
    MediaFile(docId,
      OfficeFixtures.buildSyntheticXlsx(sharedStrings, docId % 2 == 0))
  }

  /** Construction half of the PPTX round trip (l132): the document's
    * text as one slide paragraph split across TWO `<a:t>` runs,
    * entity-escaped per run, the slide resolved through the
    * presentation's `<p:sldId r:id>` rels chain. Deflate on even
    * ids. */
  def syntheticPptx(docId: Long, text: String): MediaFile = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    var cut = text.length / 2
    if (cut > 0 && cut < text.length && Character.isLowSurrogate(text.charAt(cut)))
      cut -= 1
    val (r1, r2) = (esc(text.substring(0, cut)), esc(text.substring(cut)))
    val slide = "<?xml version=\"1.0\"?>" +
      "<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" " +
      "xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\">" +
      s"<p:txBody><a:p><a:r><a:t>$r1</a:t></a:r>" +
      s"<a:r><a:t>$r2</a:t></a:r></a:p></p:txBody></p:sld>"
    MediaFile(docId,
      OfficeFixtures.buildSyntheticPptx(slide, docId % 2 == 0))
  }

  /** Construction half of the ODT round trip (l134): the document's
    * text as one `<text:p>` split across TWO `<text:span>` inline
    * elements at the midpoint (span concatenation load-bearing),
    * entity-escaped per span. Deflate on even ids. */
  def syntheticOdt(docId: Long, text: String): MediaFile = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    var cut = text.length / 2
    if (cut > 0 && cut < text.length && Character.isLowSurrogate(text.charAt(cut)))
      cut -= 1
    val (r1, r2) = (esc(text.substring(0, cut)), esc(text.substring(cut)))
    val content = "<?xml version=\"1.0\"?>" +
      "<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
      "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">" +
      "<office:body><office:text>" +
      s"<text:p><text:span>$r1</text:span><text:span>$r2</text:span></text:p>" +
      "</office:text></office:body></office:document-content>"
    MediaFile(docId, OfficeFixtures.buildSyntheticOdt(content, docId % 2 == 0))
  }

  /** Stub fallback with the family's byte-length arithmetic. */
  def decodeOffice(m: MediaFile): OfficeMeta =
    parseOffice(m).getOrElse {
      val bl = m.payload.length.toLong
      OfficeMeta(m.doc_id, bl, "stub", 1L + bl % 7L, encrypted = false,
        bl % 1000L, 1L + bl % 11L, "", "", container = "stub")
    }

  /** [[Multimodal.extractMetaPdf]]'s office twin at the same
    * `mapPartitions` boundary. */
  def extractMeta(files: Dataset[MediaFile]): Dataset[OfficeMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeOffice))
  }
}
