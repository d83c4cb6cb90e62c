package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Dataset, SparkSession}

import Multimodal.MediaFile
import OfficeZip.OfficeMeta

/**
 * Deterministic DOCX/EPUB payloads for the l115 oracle — the
 * l48/l61/l112 fixture discipline, zip twin: a tiny byte-exact zip
 * WRITER (local headers + central directory + EOCD per PKWARE APPNOTE,
 * CRC32 and raw-Deflate from `java.util.zip` — the construction twins
 * of the walk under test) assembles each container from known
 * parameters, and the DuckDB oracle is a VALUES relation of those SAME
 * parameters. A match proves [[OfficeZip]] reads back exactly what the
 * construction wrote, independent of the parser.
 */
object OfficeFixtures {

  private final case class Member(name: String, data: Array[Byte],
                                  deflate: Boolean = false,
                                  encryptedFlag: Boolean = false)

  /** Minimal spec-conformant zip: per member a local header + payload
    * (stored or raw-deflated), then the central directory, then EOCD.
    * `encryptedFlag` sets general-purpose bit 0 WITHOUT ciphering the
    * payload — enough to prove the reader refuses flagged entries.
    * `zip64` writes the MODERN large-archive shape (PKWARE APPNOTE
    * §4.3.14–15, §4.5.3): every central-directory size/offset field
    * carries the 0xFFFFFFFF sentinel with the real u64 values in a
    * zip64 extended-information extra field, the classic EOCD carries
    * the 0xFFFF/0xFFFFFFFF sentinels, and the real count/offset live
    * in a zip64 EOCD record reached through its locator — the layout a
    * ≥4 GiB or ≥65,535-entry archive MUST use, forced here at fixture
    * size so the walk is certified byte-exactly. */
  private def buildZip(members: Seq[Member], zip64: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    def w64(v: Long): Unit = { w32(v & 0xFFFFFFFFL); w32((v >> 32) & 0xFFFFFFFFL) }
    def sig(c: Int, d: Int): Unit = { out.write(0x50); out.write(0x4B); out.write(c); out.write(d) }
    val rows = members.map { m =>
      val crc = new java.util.zip.CRC32()
      crc.update(m.data)
      val comp =
        if (m.deflate) {
          val d = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw
          d.setInput(m.data); d.finish()
          val buf = new Array[Byte](m.data.length * 2 + 64)
          val n = d.deflate(buf); d.end()
          java.util.Arrays.copyOfRange(buf, 0, n)
        } else m.data
      val off = out.size.toLong
      val nameB = m.name.getBytes(UTF_8)
      sig(0x03, 0x04) // local file header
      w16(if (zip64) 45 else 20); w16(if (m.encryptedFlag) 1 else 0)
      w16(if (m.deflate) 8 else 0)
      w16(0); w16(0) // dos time/date: fixed zero, determinism
      w32(crc.getValue); w32(comp.length.toLong); w32(m.data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(comp)
      (m, crc.getValue, comp.length.toLong, off, nameB)
    }
    val cdStart = out.size.toLong
    rows.foreach { case (m, crc, compLen, off, nameB) =>
      sig(0x01, 0x02) // central directory header
      w16(if (zip64) 45 else 20); w16(if (zip64) 45 else 20)
      w16(if (m.encryptedFlag) 1 else 0); w16(if (m.deflate) 8 else 0)
      w16(0); w16(0)
      w32(crc)
      if (zip64) { w32(0xFFFFFFFFL); w32(0xFFFFFFFFL) } // sentinels →
      else { w32(compLen); w32(m.data.length.toLong) }  // extra field
      w16(nameB.length); w16(if (zip64) 28 else 0); w16(0) // name/extra/comment
      w16(0); w16(0); w32(0) // disk#, internal, external attrs
      if (zip64) w32(0xFFFFFFFFL) else w32(off)
      out.write(nameB)
      if (zip64) { // zip64 extended info: uncomp, comp, local offset
        w16(0x0001); w16(24)
        w64(m.data.length.toLong); w64(compLen); w64(off)
      }
    }
    val cdSize = out.size.toLong - cdStart
    if (zip64) {
      val z64Off = out.size.toLong
      sig(0x06, 0x06) // zip64 EOCD record
      w64(44) // size of remainder
      w16(45); w16(45) // made by / needed
      w32(0); w32(0) // this disk / cd disk
      w64(rows.length.toLong); w64(rows.length.toLong)
      w64(cdSize); w64(cdStart)
      sig(0x06, 0x07) // zip64 EOCD locator
      w32(0); w64(z64Off); w32(1)
      sig(0x05, 0x06) // classic EOCD, all sentinels
      w16(0); w16(0); w16(0xFFFF); w16(0xFFFF)
      w32(0xFFFFFFFFL); w32(0xFFFFFFFFL); w16(0)
    } else {
      sig(0x05, 0x06) // EOCD
      w16(0); w16(0); w16(rows.length); w16(rows.length)
      w32(cdSize); w32(cdStart); w16(0)
    }
    out.toByteArray
  }

  private def s(x: String): Array[Byte] = x.getBytes(UTF_8)

  private val ContentTypes = s("<?xml version=\"1.0\"?><Types " +
    "xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\"/>")

  /** DOCX 1: run-SPLIT words ("Alp" + "ha beta gamma" concatenate to
    * "Alpha beta gamma" — 3 words, not 4) plus an entity-escaped run;
    * Dublin Core title/language in core.xml. 7 words, 2 paragraphs. */
  private def docx1: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes),
    Member("word/document.xml", s("<?xml version=\"1.0\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
      "<w:p><w:r><w:t>Alp</w:t></w:r><w:r><w:t xml:space=\"preserve\">ha beta gamma</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t xml:space=\"preserve\">delta epsilon &amp; zeta</w:t></w:r></w:p>" +
      "</w:body></w:document>")),
    Member("docProps/core.xml", s("<?xml version=\"1.0\"?>" +
      "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/metadata/core-properties\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
      "<dc:title>Spec &amp; Doc</dc:title><dc:language>en-US</dc:language>" +
      "</cp:coreProperties>"))))

  /** DOCX 2: Deflate-compressed members (the inflate path), no
    * core.xml. 5 words, 1 paragraph. */
  private def docx2: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes, deflate = true),
    Member("word/document.xml", s("<?xml version=\"1.0\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
      "<w:p><w:r><w:t>the quick brown fox jumps</w:t></w:r></w:p>" +
      "</w:body></w:document>"), deflate = true)))

  /** DOCX 3: run-level whitespace ELEMENTS — an attribute-less
    * `<w:tab/>` (tab char) next to an ATTRIBUTED tab-STOP definition
    * inside `<w:pPr><w:tabs>` (must emit nothing), a `<w:br/>` and a
    * `<w:cr/>` line break. Expected text, hand-folded:
    * "col1\tcol2\nline one\nline two\nend" — 7 whitespace-run words
    * (tab and breaks are whitespace), 2 paragraphs. */
  private def docx3: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes),
    Member("word/document.xml", s("<?xml version=\"1.0\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
      "<w:p><w:pPr><w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/></w:tabs></w:pPr>" +
      "<w:r><w:t>col1</w:t></w:r><w:r><w:tab/></w:r><w:r><w:t>col2</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>line one</w:t><w:br/><w:t>line two</w:t><w:cr/><w:t>end</w:t></w:r></w:p>" +
      "</w:body></w:document>"), deflate = true)))

  private def epubOpf: Array[Byte] = s("<?xml version=\"1.0\"?>" +
    "<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\">" +
    "<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
    "<dc:title>Moby Format</dc:title><dc:language>en</dc:language></metadata>" +
    "<manifest><item id=\"c1\" href=\"ch1.xhtml\"/><item id=\"c2\" href=\"ch2.xhtml\"/>" +
    "<item id=\"c3\" href=\"ch3.xhtml\"/></manifest>" +
    "<spine><itemref idref=\"c1\"/><itemref idref=\"c2\"/><itemref idref=\"c3\"/></spine>" +
    "</package>")

  private def epubMembers: Seq[Member] = Seq(
    Member("mimetype", s("application/epub+zip")),
    Member("META-INF/container.xml", s("<?xml version=\"1.0\"?>" +
      "<container xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\" version=\"1.0\">" +
      "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
      "media-type=\"application/oebps-package+xml\"/></rootfiles></container>")),
    Member("OEBPS/content.opf", epubOpf, deflate = true),
    // chapter 1 carries a style block (stripped) and an entity; 2 and 3
    // plain prose — manifest hrefs resolve relative to OEBPS/
    Member("OEBPS/ch1.xhtml", s("<html><head><style>p{color:red}</style></head>" +
      "<body><p>chapter one begins &amp; ends</p></body></html>"),
      deflate = true),
    Member("OEBPS/ch2.xhtml", s("<html><body><p>chapter two follows</p></body></html>")),
    Member("OEBPS/ch3.xhtml", s("<html><body><h1>chapter three</h1><p>closes the tale</p></body></html>"),
      deflate = true))

  /** EPUB: title/language via container.xml → OPF, 3 spine items. */
  private def epub1: Array[Byte] = buildZip(epubMembers)

  /** EPUB with DRM marker: META-INF/encryption.xml ⇒ encrypted, no
    * content fields. */
  private def epub2: Array[Byte] = buildZip(epubMembers :+
    Member("META-INF/encryption.xml", s("<encryption/>")))

  /** DOCX whose document member carries the zip-crypto flag bit. */
  private def docxEnc: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes),
    Member("word/document.xml", s("ciphertext-bytes-here"), encryptedFlag = true)))

  /** docx1's members in the FORCED zip64 layout: sentinel CD fields +
    * zip64 extra, zip64 EOCD record + locator, sentinel classic EOCD —
    * the modern large-archive shape at fixture size. Logical fields
    * must read back identical to docx1's. */
  private[operators] def docxZip64: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes),
    Member("word/document.xml", s("<?xml version=\"1.0\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
      "<w:p><w:r><w:t>Alp</w:t></w:r><w:r><w:t xml:space=\"preserve\">ha beta gamma</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t xml:space=\"preserve\">delta epsilon &amp; zeta</w:t></w:r></w:p>" +
      "</w:body></w:document>"), deflate = true),
    Member("docProps/core.xml", s("<?xml version=\"1.0\"?>" +
      "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/metadata/core-properties\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
      "<dc:title>Spec &amp; Doc</dc:title><dc:language>en-US</dc:language>" +
      "</cp:coreProperties>"))), zip64 = true)

  /** XLSX: two sheets whose WORKBOOK order (Beta=sheet2 first) differs
    * from numeric filename order, so the rels-resolved walk is
    * load-bearing; shared strings with a rich-text RUN SPLIT ("net " +
    * "income &amp; tax" — one string, runs concatenate) and an entity;
    * an inline string, a numeric cell, and a self-closing empty cell.
    * Expected text, hand-folded from these member sources:
    * "quarterly revenue\t42\ninline note\nnet income & tax" (9 words,
    * 2 sheets). */
  private def xlsx1: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes),
    Member("xl/workbook.xml", s("<?xml version=\"1.0\"?>" +
      "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
      "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
      "<sheets><sheet name=\"Beta\" sheetId=\"2\" r:id=\"rId2\"/>" +
      "<sheet name=\"Alpha\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>")),
    Member("xl/_rels/workbook.xml.rels", s("<?xml version=\"1.0\"?>" +
      "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
      "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet1.xml\"/>" +
      "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet2.xml\"/>" +
      "</Relationships>"), deflate = true),
    Member("xl/sharedStrings.xml", s("<?xml version=\"1.0\"?>" +
      "<sst count=\"2\" uniqueCount=\"2\"><si><t>quarterly revenue</t></si>" +
      "<si><r><t xml:space=\"preserve\">net </t></r><r><t>income &amp; tax</t></r></si></sst>"),
      deflate = true),
    Member("xl/worksheets/sheet2.xml", s("<?xml version=\"1.0\"?>" +
      "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>" +
      "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>0</v></c><c r=\"B1\"><v>42</v></c></row>" +
      "<row r=\"2\"><c r=\"A2\" t=\"inlineStr\"><is><t>inline note</t></is></c></row>" +
      "</sheetData></worksheet>")),
    Member("xl/worksheets/sheet1.xml", s("<?xml version=\"1.0\"?>" +
      "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>" +
      "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>1</v></c><c r=\"B1\" s=\"1\"/></row>" +
      "</sheetData></worksheet>"), deflate = true),
    Member("docProps/core.xml", s("<?xml version=\"1.0\"?>" +
      "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/metadata/core-properties\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
      "<dc:title>Q Report</dc:title><dc:language>en</dc:language>" +
      "</cp:coreProperties>"))))

  /** PPTX: two slides whose PRESENTATION order (slide2 first) differs
    * from numeric filename order; a run-split paragraph ("open" +
    * "ing remarks") and an entity. Expected text:
    * "opening remarks\nclosing & thanks\nfin" (6 words, 2 slides). */
  private def pptx1: Array[Byte] = buildZip(Seq(
    Member("[Content_Types].xml", ContentTypes),
    Member("ppt/presentation.xml", s("<?xml version=\"1.0\"?>" +
      "<p:presentation xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" " +
      "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
      "<p:sldIdLst><p:sldId id=\"257\" r:id=\"rId2\"/>" +
      "<p:sldId id=\"256\" r:id=\"rId1\"/></p:sldIdLst></p:presentation>")),
    Member("ppt/_rels/presentation.xml.rels", s("<?xml version=\"1.0\"?>" +
      "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
      "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide\" Target=\"slides/slide1.xml\"/>" +
      "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide\" Target=\"slides/slide2.xml\"/>" +
      "</Relationships>"), deflate = true),
    Member("ppt/slides/slide2.xml", s("<?xml version=\"1.0\"?>" +
      "<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" " +
      "xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\">" +
      "<p:txBody><a:p><a:r><a:t>open</a:t></a:r>" +
      "<a:r><a:t>ing remarks</a:t></a:r></a:p></p:txBody></p:sld>"), deflate = true),
    Member("ppt/slides/slide1.xml", s("<?xml version=\"1.0\"?>" +
      "<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" " +
      "xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\">" +
      "<p:txBody><a:p><a:r><a:t>closing &amp; thanks</a:t></a:r></a:p>" +
      "<a:p><a:r><a:t>fin</a:t></a:r></a:p></p:txBody></p:sld>")),
    Member("docProps/core.xml", s("<?xml version=\"1.0\"?>" +
      "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/metadata/core-properties\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
      "<dc:title>Deck</dc:title><dc:language>de</dc:language>" +
      "</cp:coreProperties>"))))

  /** ODT: mimetype-detected OpenDocument text — two paragraphs (one a
    * `<text:h>` heading), a SPAN SPLIT ("Lib" + "reOffice prose"), a
    * `<text:tab/>` and `<text:s/>` substitution, an entity; dc:title /
    * dc:language from meta.xml. Expected text, hand-folded:
    * "Annual Report\nLibreOffice prose\twith & spaced words" —
    * 8 whitespace-run words (TAB is whitespace), 2 paragraphs. */
  private def odt1: Array[Byte] = buildZip(Seq(
    Member("mimetype", s("application/vnd.oasis.opendocument.text")),
    Member("content.xml", s("<?xml version=\"1.0\"?>" +
      "<office:document-content xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
      "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\">" +
      "<office:body><office:text>" +
      "<text:h text:outline-level=\"1\">Annual Report</text:h>" +
      "<text:p><text:span>Lib</text:span><text:span>reOffice prose</text:span>" +
      "<text:tab/>with &amp;<text:s/>spaced words</text:p>" +
      "</office:text></office:body></office:document-content>"), deflate = true),
    Member("meta.xml", s("<?xml version=\"1.0\"?>" +
      "<office:document-meta xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\"><office:meta>" +
      "<dc:title>Year One</dc:title><dc:language>fr</dc:language>" +
      "</office:meta></office:document-meta>"))))

  /** Plain zip, neither format. */
  private def plainZip: Array[Byte] = buildZip(Seq(
    Member("readme.txt", s("just a zip"))))

  /** Zip magic, EOCD truncated away. */
  private def truncatedZip: Array[Byte] = {
    val full = docx1
    java.util.Arrays.copyOfRange(full, 0, full.length / 2)
  }

  private def textPayload: Array[Byte] =
    s("these bytes are prose, not an office container")

  /** (payload, expected metadata) — expectations from construction
    * parameters, never the parser under test. */
  lazy val fixtures: Seq[(MediaFile, OfficeMeta)] = {
    val (d1, d2, e1, e2, de, pz, tz, tp) =
      (docx1, docx2, epub1, epub2, docxEnc, plainZip, truncatedZip, textPayload)
    val z64 = docxZip64
    val (xl1, pp1, od1, d3) = (xlsx1, pptx1, odt1, docx3)
    def bl(b: Array[Byte]) = b.length.toLong
    Seq(
      (MediaFile(1L, d1), OfficeMeta(1L, bl(d1), "docx", 3L, encrypted = false,
        7L, 2L, "Spec & Doc", "en-US", "zip")),
      (MediaFile(2L, d2), OfficeMeta(2L, bl(d2), "docx", 2L, encrypted = false,
        5L, 1L, "", "", "zip")),
      // 13 = 5 + 3 + 5 words across the three spine chapters' stripped
      // prose (hand-counted from the member sources above)
      (MediaFile(3L, e1), OfficeMeta(3L, bl(e1), "epub", 6L, encrypted = false,
        13L, 3L, "Moby Format", "en", "zip")),
      (MediaFile(4L, e2), OfficeMeta(4L, bl(e2), "epub", 7L, encrypted = true,
        0L, 0L, "", "", "zip")),
      (MediaFile(5L, de), OfficeMeta(5L, bl(de), "docx", 2L, encrypted = true,
        0L, 0L, "", "", "zip")),
      (MediaFile(6L, pz), OfficeMeta(6L, bl(pz), "zip", 1L, encrypted = false,
        0L, 0L, "", "", "zip")),
      (MediaFile(7L, tz), OfficeMeta(7L, bl(tz), "zip", 0L, encrypted = false,
        0L, 0L, "", "", "zip")),
      (MediaFile(8L, tp), OfficeMeta(8L, bl(tp), "stub", 1L + bl(tp) % 7L,
        encrypted = false, bl(tp) % 1000L, 1L + bl(tp) % 11L, "", "", "stub")),
      // zip64-forced docx1: identical logical fields through the zip64
      // EOCD locator + extra-field walk
      (MediaFile(9L, z64), OfficeMeta(9L, bl(z64), "docx", 3L, encrypted = false,
        7L, 2L, "Spec & Doc", "en-US", "zip")),
      // 9 words hand-counted from the xlsx1 member sources (shared-
      // string, numeric, inline-string cells over two sheets)
      (MediaFile(10L, xl1), OfficeMeta(10L, bl(xl1), "xlsx", 7L, encrypted = false,
        9L, 2L, "Q Report", "en", "zip")),
      // 6 words from pptx1's two slides (presentation order)
      (MediaFile(11L, pp1), OfficeMeta(11L, bl(pp1), "pptx", 6L, encrypted = false,
        6L, 2L, "Deck", "de", "zip")),
      // 8 whitespace-run words from odt1's heading + tab/space/span
      // paragraph (hand-folded above)
      (MediaFile(12L, od1), OfficeMeta(12L, bl(od1), "odt", 3L, encrypted = false,
        8L, 2L, "Year One", "fr", "zip")),
      // 7 words across docx3's tab/br/cr whitespace elements (the
      // attributed tab-STOP definition emits nothing)
      (MediaFile(13L, d3), OfficeMeta(13L, bl(d3), "docx", 2L, encrypted = false,
        7L, 2L, "", "", "zip")))
  }

  /** The l115 input frame. */
  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(fixtures.map(_._1))
  }

  /** The l122 construction hook: a two-member DOCX around a given
    * document.xml body (the zip writer is the fixture object's so the
    * byte-exact construction lives in one place). */
  private[operators] def buildSyntheticDocx(documentXml: String,
                                            deflate: Boolean): Array[Byte] =
    buildZip(Seq(
      Member("[Content_Types].xml", ContentTypes, deflate = deflate),
      Member("word/document.xml", s(documentXml), deflate = deflate)))

  /** The l147 construction hook ([[graft.sources.Zip]]'s tar-twin
    * round trip): a PLAIN archive zip — directory entry (listed but
    * not a member), the text STORED, the text raw-DEFLATED, and an
    * encryption-FLAGGED copy the reader must surface with an empty
    * head (visible, not readable). `zip64` forces the sentinel +
    * extended-information layout on a quarter of the corpus. */
  private[graft] def buildSyntheticArchiveZip(fileId: Long,
                                              text: String): Array[Byte] =
    buildZip(Seq(
      Member(s"docs/", Array.emptyByteArray),
      Member(s"docs/$fileId.txt", s(text)),
      Member(s"docs/$fileId.z.txt", s(text), deflate = true),
      Member(s"docs/$fileId.locked.txt", s(text), encryptedFlag = true)),
      zip64 = fileId % 4 == 0)

  /** The l124 construction hook: a minimal four-member EPUB around a
    * given chapter XHTML body. */
  private[operators] def buildSyntheticEpub(chapterXhtml: String,
                                            deflate: Boolean): Array[Byte] =
    buildZip(Seq(
      Member("mimetype", s("application/epub+zip")),
      Member("META-INF/container.xml", s("<?xml version=\"1.0\"?>" +
        "<container xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\" version=\"1.0\">" +
        "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
        "media-type=\"application/oebps-package+xml\"/></rootfiles></container>")),
      Member("OEBPS/content.opf", s("<?xml version=\"1.0\"?>" +
        "<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"3.0\">" +
        "<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
        "<dc:title>wrapped</dc:title><dc:language>en</dc:language></metadata>" +
        "<manifest><item id=\"c1\" href=\"ch1.xhtml\"/></manifest>" +
        "<spine><itemref idref=\"c1\"/></spine></package>"), deflate = deflate),
      Member("OEBPS/ch1.xhtml", s(chapterXhtml), deflate = deflate)))

  /** The l131 construction hook: a five-member XLSX around a given
    * sharedStrings.xml — one `t="s"` cell referencing string 0, the
    * sheet reached through a real rels indirection. */
  private[operators] def buildSyntheticXlsx(sharedStringsXml: String,
                                            deflate: Boolean): Array[Byte] =
    buildZip(Seq(
      Member("[Content_Types].xml", ContentTypes, deflate = deflate),
      Member("xl/workbook.xml", s("<?xml version=\"1.0\"?>" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
        "<sheets><sheet name=\"S1\" sheetId=\"1\" r:id=\"rId1\"/></sheets></workbook>")),
      Member("xl/_rels/workbook.xml.rels", s("<?xml version=\"1.0\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet1.xml\"/>" +
        "</Relationships>")),
      Member("xl/sharedStrings.xml", s(sharedStringsXml), deflate = deflate),
      Member("xl/worksheets/sheet1.xml", s("<?xml version=\"1.0\"?>" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>" +
        "<row r=\"1\"><c r=\"A1\" t=\"s\"><v>0</v></c></row>" +
        "</sheetData></worksheet>"), deflate = deflate)))

  /** The l132 construction hook: a four-member PPTX around a given
    * slide XML, the slide reached through the presentation rels. */
  private[operators] def buildSyntheticPptx(slideXml: String,
                                            deflate: Boolean): Array[Byte] =
    buildZip(Seq(
      Member("[Content_Types].xml", ContentTypes, deflate = deflate),
      Member("ppt/presentation.xml", s("<?xml version=\"1.0\"?>" +
        "<p:presentation xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" " +
        "xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\">" +
        "<p:sldIdLst><p:sldId id=\"256\" r:id=\"rId1\"/></p:sldIdLst></p:presentation>")),
      Member("ppt/_rels/presentation.xml.rels", s("<?xml version=\"1.0\"?>" +
        "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
        "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide\" Target=\"slides/slide1.xml\"/>" +
        "</Relationships>")),
      Member("ppt/slides/slide1.xml", s(slideXml), deflate = deflate)))

  /** The l134 construction hook: a two-member ODT around a given
    * content.xml (mimetype member carries the format detection). */
  private[operators] def buildSyntheticOdt(contentXml: String,
                                           deflate: Boolean): Array[Byte] =
    buildZip(Seq(
      Member("mimetype", s("application/vnd.oasis.opendocument.text")),
      Member("content.xml", s(contentXml), deflate = deflate)))

  /** (payload, expected text) for l120 — hand-derived from the SAME
    * member sources (paragraph-run concatenation for DOCX, spine-order
    * XHTML stripping for EPUB, workbook/presentation-ordered cells and
    * slide paragraphs for XLSX/PPTX), never from the parser under
    * test. */
  lazy val textFixtures: Seq[(MediaFile, OfficeZip.OfficeText)] = {
    val docx1Text = "Alpha beta gamma\ndelta epsilon & zeta"
    val docx2Text = "the quick brown fox jumps"
    val epubText = "chapter one begins & ends\nchapter two follows\n" +
      "chapter three closes the tale"
    // hand-folded from the xlsx1 / pptx1 member sources (workbook /
    // presentation order, rels-resolved; cells TAB-joined per row)
    val xlsxText = "quarterly revenue\t42\ninline note\nnet income & tax"
    val pptxText = "opening remarks\nclosing & thanks\nfin"
    val odtText = "Annual Report\nLibreOffice prose\twith & spaced words"
    val docx3Text = "col1\tcol2\nline one\nline two\nend"
    fixtures.map { case (file, meta) =>
      val text = (meta.format, meta.encrypted) match {
        case ("docx", false) if file.doc_id == 1L || file.doc_id == 9L =>
          docx1Text // doc 9 is docx1's members in the zip64 layout
        case ("docx", false) if file.doc_id == 2L => docx2Text
        case ("docx", false) if file.doc_id == 13L => docx3Text
        case ("epub", false) => epubText
        case ("xlsx", false) => xlsxText
        case ("pptx", false) => pptxText
        case ("odt", false) => odtText
        case _ => "" // encrypted / plain zip / truncated / stub
      }
      (file, OfficeZip.OfficeText(file.doc_id, meta.format, text,
        text.length.toLong, meta.container))
    }
  }

  /** The l120 DuckDB oracle: the construction-side expected text. */
  def textOracleSql: String = {
    val rows = textFixtures.map { case (_, t) =>
      s"(CAST(${t.doc_id} AS BIGINT), '${t.format}', " +
        s"${PdfFixtures.sqlLit(t.text)}, CAST(${t.n_chars} AS BIGINT), " +
        s"'${t.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, format, text, n_chars, container) ORDER BY doc_id"
  }

  /** The l115 DuckDB oracle: construction-side expectations. */
  def oracleSql: String = {
    val rows = fixtures.map { case (_, m) =>
      s"(CAST(${m.doc_id} AS BIGINT), CAST(${m.byte_len} AS BIGINT), " +
        s"'${m.format}', CAST(${m.n_entries} AS BIGINT), " +
        s"${m.encrypted.toString.toUpperCase}, CAST(${m.n_words} AS BIGINT), " +
        s"CAST(${m.n_parts} AS BIGINT), '${m.title.replace("'", "''")}', " +
        s"'${m.language}', '${m.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, byte_len, format, n_entries, encrypted, n_words, " +
      "n_parts, title, language, container) ORDER BY doc_id"
  }
}
