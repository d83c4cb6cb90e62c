package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset

import Multimodal.MediaFile

/**
 * MS-CFB compound files and legacy binary Word (`.doc`) text — the
 * remaining big real-crawl document family after the OPC/ODF zips
 * (l122/l124/l131/l132/l134): everything Office wrote before 2007.
 * Both formats are public Microsoft Open Specifications:
 *
 *  - [MS-CFB] the compound file binary format: a 512-byte (v3) or
 *    4096-byte (v4) sector file system — header DIFAT → FAT sector
 *    chains, a directory of 128-byte entries (UTF-16LE names, stream
 *    start + size), and a MINI stream (the root entry's stream) of
 *    64-byte mini sectors chained through the miniFAT for streams
 *    under the 4096-byte cutoff. [[Cfb.parse]] walks exactly that;
 *    [[Cfb.stream]] reads one named stream through whichever FAT
 *    applies.
 *  - [MS-DOC] the WordDocument stream: FIB magic `wIdent = 0xA5EC`,
 *    the `fWhichTblStm` flag (FIB base offset 0x0A, bit 0x0200)
 *    selecting the `1Table`/`0Table` companion stream, `fcClx`/
 *    `lcbClx` (offsets 0x01A2/0x01A6, the Word-97+ FibRgFcLcb97
 *    layout) locating the Clx in the table stream, and the PIECE
 *    TABLE: skip `clxt = 1` Prc blocks, then the `clxt = 2` Pcdt's
 *    PlcPcd — n+1 character positions plus n PCDs whose `fc` word
 *    carries bit 30 = fCompressed (8-bit cp1252 text at `fc/2`) vs
 *    clear (UTF-16LE at `fc`). Pieces concatenate in CP order;
 *    Word's `\r` paragraph marks read back as `\n`.
 *
 *  - [MS-XLS] BIFF8 (`.xls`): the `Workbook` stream's record walk —
 *    SST shared strings (CONTINUE straddles with mid-string mode
 *    flips), worksheet LabelSst cells in BoundSheet8 tab order, the
 *    XLSX walk's cell/row/sheet joining.
 *  - [MS-PPT] (`.ppt`): the `PowerPoint Document` record tree —
 *    containers recursed, TextCharsAtom/TextBytesAtom leaves collected
 *    in stream order.
 *
 * Degradation, never exceptions (the crawl decode contract): no CFB
 * signature → stub; a readable container that is none of the three
 * Office families → empty text, container
 * "cfb"; bounds violations anywhere in the sector walk truncate to
 * whatever parsed. Caps: 64 Ki sectors (≤ 32 MiB v3 / 256 MiB v4
 * addressed), directory ≤ 64 Ki entries.
 *
 * Scale: one `mapPartitions` codec boundary like every other decoder
 * family — payloads never touch the driver, per-row work only.
 */
object Cfb {

  private val Signature =
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)

  private val FreeSect = 0xFFFFFFFFL
  private val EndOfChain = 0xFFFFFFFEL
  private val MaxSectors = 1 << 16
  private val NoStream = 0xFFFFFFFFL

  private def u16(b: Array[Byte], off: Int): Int =
    if (off + 2 > b.length) -1
    else (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private[operators] final case class DirEntry(name: String, objType: Int,
                                               startSector: Long, size: Long)

  private[operators] final case class CfbFile(payload: Array[Byte],
      sectorSize: Int, fat: Array[Long], miniFat: Array[Long],
      entries: Seq[DirEntry], miniStream: Array[Byte], miniCutoff: Long) {
    /** One named stream's bytes, via the FAT or (small, non-root) the
      * mini-stream miniFAT — exact name match, first entry wins. */
    def stream(name: String): Option[Array[Byte]] =
      entries.find(e => e.objType == 2 && e.name == name).map { e =>
        if (e.size < miniCutoff) readMini(e.startSector, e.size)
        else readChain(payload, sectorSize, fat, e.startSector, e.size)
      }
    private def readMini(start: Long, size: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, math.min(size, 1L << 16).toInt))
      var s = start
      var seen = 0
      while (s != EndOfChain && s >= 0 && s < miniFat.length &&
             seen < MaxSectors && out.size < size) {
        val off = (s * 64).toInt
        if (off >= 0 && off < miniStream.length)
          out.write(miniStream, off, math.min(64, miniStream.length - off))
        s = miniFat(s.toInt)
        seen += 1
      }
      val a = out.toByteArray
      if (a.length > size) java.util.Arrays.copyOf(a, size.toInt) else a
    }
  }

  /** Sector `n` starts at `(n + 1) << sectorShift` — the header IS
    * "sector −1" ([MS-CFB] §2.2). */
  private def readChain(b: Array[Byte], ssz: Int, fat: Array[Long],
                        start: Long, size: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, math.min(size, 1L << 16).toInt))
    var s = start
    var seen = 0
    while (s != EndOfChain && s >= 0 && s < fat.length && seen < MaxSectors &&
           out.size < size) {
      val off = ((s + 1) * ssz).toInt
      if (off >= 0 && off < b.length)
        out.write(b, off, math.min(ssz, b.length - off))
      s = fat(s.toInt)
      seen += 1
    }
    val a = out.toByteArray
    if (size >= 0 && a.length > size) java.util.Arrays.copyOf(a, size.toInt) else a
  }

  /** Full container walk; None when the signature is absent or the
    * header is structurally unusable. */
  private[operators] def parse(b: Array[Byte]): Option[CfbFile] = {
    try {
      if (b.length < 512) return None
      var i = 0
      while (i < 8) { if (b(i) != Signature(i)) return None; i += 1 }
      val sectorShift = u16(b, 0x1E)
      if (sectorShift != 9 && sectorShift != 12) return None
      val ssz = 1 << sectorShift
      val nFat = u32(b, 0x2C)
      val firstDir = u32(b, 0x30)
      val miniCutoff = u32(b, 0x38)
      val firstMiniFat = u32(b, 0x3C)
      val nMiniFat = u32(b, 0x44 - 4) // 0x40 = numMiniFatSectors
      val firstDifat = u32(b, 0x44)
      val nDifat = u32(b, 0x48)
      // FAT sector list: 109 header DIFAT entries, then DIFAT sector
      // chain (last 4 bytes of each DIFAT sector = next DIFAT sector)
      val fatSectors = scala.collection.mutable.ArrayBuffer[Long]()
      var k = 0
      while (k < 109 && fatSectors.length < nFat) {
        val v = u32(b, 0x4C + k * 4)
        if (v != FreeSect && v >= 0) fatSectors += v
        k += 1
      }
      var difat = firstDifat
      var dSeen = 0L
      while (difat != EndOfChain && difat != FreeSect && difat >= 0 &&
             dSeen < math.min(nDifat, MaxSectors.toLong) &&
             fatSectors.length < nFat) {
        val off = ((difat + 1) * ssz).toInt
        if (off < 0 || off + ssz > b.length) difat = EndOfChain
        else {
          var j = 0
          while (j < ssz / 4 - 1 && fatSectors.length < nFat) {
            val v = u32(b, off + j * 4)
            if (v != FreeSect) fatSectors += v
            j += 1
          }
          difat = u32(b, off + ssz - 4)
          dSeen += 1
        }
      }
      val entriesPerFat = ssz / 4
      val fat = new Array[Long](math.min(fatSectors.length * entriesPerFat, MaxSectors))
      var fi = 0
      fatSectors.foreach { fs =>
        val off = ((fs + 1) * ssz).toInt
        var j = 0
        while (j < entriesPerFat && fi < fat.length) {
          fat(fi) = if (off + j * 4 + 4 <= b.length) u32(b, off + j * 4) else FreeSect
          fi += 1; j += 1
        }
      }
      // directory: 128-byte entries over the dir chain (size unknown —
      // read the whole chain)
      val dirBytes = readChain(b, ssz, fat, firstDir, Long.MaxValue >> 1)
      val nEntries = math.min(dirBytes.length / 128, 1 << 16)
      val entries = (0 until nEntries).flatMap { e =>
        val off = e * 128
        val nameLen = u16(dirBytes, off + 64)
        val objType = dirBytes(off + 66) & 0xFF
        if (objType != 2 && objType != 5 || nameLen < 2 || nameLen > 64) None
        else {
          val name = new String(dirBytes, off, nameLen - 2, "UTF-16LE")
          val start = u32(dirBytes, off + 116)
          // v3 writers may leave the high size dword unzeroed; the low
          // dword is authoritative there ([MS-CFB] §2.6.1)
          val size =
            if (ssz == 512) u32(dirBytes, off + 120)
            else u32(dirBytes, off + 120) | (u32(dirBytes, off + 124) << 32)
          Some(DirEntry(name, objType, start, math.max(0L, size)))
        }
      }
      val root = entries.find(_.objType == 5)
      val miniStream = root.map(r => readChain(b, ssz, fat, r.startSector, r.size))
        .getOrElse(Array.emptyByteArray)
      val miniFatBytes = readChain(b, ssz, fat, firstMiniFat,
        math.min(nMiniFat, MaxSectors.toLong) * ssz)
      val miniFat = new Array[Long](miniFatBytes.length / 4)
      var m = 0
      while (m < miniFat.length) { miniFat(m) = u32(miniFatBytes, m * 4); m += 1 }
      Some(CfbFile(b, ssz, fat, miniFat, entries.filter(_.objType == 2),
        miniStream, if (miniCutoff > 0) miniCutoff else 4096L))
    } catch { case NonFatal(_) => None }
  }

  // ----------------------------------------------------------- [MS-DOC]

  /** Extracted legacy-Word text. `container` = "doc" (WordDocument
    * stream parsed), "cfb" (a compound file that is not a Word doc —
    * .xls/.ppt/other; empty text), or "stub" (not a CFB at all). */
  final case class DocText(doc_id: Long, text: String, n_chars: Long,
                           container: String)

  /** The piece-table walk over an already-read WordDocument + table
    * stream pair. None = not a Word stream (bad wIdent) or an
    * unreadable Clx; pieces that fall outside the stream contribute
    * nothing (degrade). */
  private[operators] def pieceTableText(wd: Array[Byte],
                                        table: Array[Byte]): Option[String] = {
    if (u16(wd, 0) != 0xA5EC) return None
    val fcClx = u32(wd, 0x01A2)
    val lcbClx = u32(wd, 0x01A6)
    if (fcClx < 0 || lcbClx <= 0 || fcClx + lcbClx > table.length) return None
    var i = fcClx.toInt
    val clxEnd = (fcClx + lcbClx).toInt
    // Prc blocks (clxt = 1): 1 + 2-byte cbGrpprl + payload — skip
    while (i < clxEnd && (table(i) & 0xFF) == 1) {
      val cb = u16(table, i + 1)
      if (cb < 0) return None
      i += 3 + cb
    }
    if (i >= clxEnd || (table(i) & 0xFF) != 2) return None
    val lcb = u32(table, i + 1)
    val plc = i + 5
    if (lcb < 4 || plc + lcb > clxEnd + 1) return None
    val n = ((lcb - 4) / 12).toInt // 4(n+1) CPs + 8n PCDs
    if (n <= 0) return Some("")
    val out = new StringBuilder
    var k = 0
    while (k < n) {
      val cp0 = u32(table, plc + k * 4)
      val cp1 = u32(table, plc + (k + 1) * 4)
      val pcdOff = plc + (n + 1) * 4 + k * 8
      val fcWord = u32(table, pcdOff + 2)
      val len = (cp1 - cp0).toInt
      if (len > 0 && fcWord >= 0) {
        val compressed = ((fcWord >> 30) & 1L) == 1L
        val fc = fcWord & 0x3FFFFFFFL
        if (compressed) {
          val off = (fc / 2).toInt
          if (off >= 0 && off + len <= wd.length)
            out.append(new String(wd, off, len, "windows-1252"))
        } else {
          val off = fc.toInt
          if (off >= 0 && off + 2L * len <= wd.length)
            out.append(new String(wd, off, 2 * len, "UTF-16LE"))
        }
      }
      k += 1
    }
    // Word stores paragraph marks as CR; the extraction contract reads
    // them back as LF (the same normalization every production .doc
    // extractor applies). FIELDS ([MS-DOC] §2.8.25): real documents are
    // full of them (HYPERLINK, PAGE, TOC) — the field CODE between the
    // begin (0x13) and separator (0x14) marks is instruction text and
    // is dropped; the field RESULT between separator and end (0x15) is
    // the display text and is kept; the marks themselves never surface.
    // Remaining sub-space control chars Word embeds in text (cell/row
    // marks 0x07, pictures 0x01, embedded-object anchors 0x08, line
    // break 0x0B → LF) are normalized so downstream text ops never see
    // binary. Tab survives.
    Some(stripFieldsAndControls(out.toString.replace('\r', '\n')))
  }

  private[operators] def stripFieldsAndControls(s: String): String = {
    val out = new StringBuilder(s.length)
    // field stack: one entry per open field, true once its separator
    // was seen (code region closed). A field may have NO separator
    // (no-result fields) — its end mark must close the code region,
    // while a field WITH a separator had it closed already.
    val sepSeen = scala.collection.mutable.ArrayBuffer[Boolean]()
    var codeDepth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\u0013') { sepSeen += false; codeDepth += 1 } // begin
      else if (c == '\u0014') { // separator: result follows
        if (sepSeen.nonEmpty && !sepSeen.last) {
          sepSeen(sepSeen.length - 1) = true; codeDepth -= 1
        }
      } else if (c == '\u0015') { // end
        if (sepSeen.nonEmpty) {
          if (!sepSeen.last) codeDepth -= 1
          sepSeen.remove(sepSeen.length - 1)
        }
      } else if (c == '\u000B') { if (codeDepth == 0) out.append('\n') }
      else if (c == '\u0007' || c == '\u0001' || c == '\u0005' || c == '\u0008') ()
      else if (codeDepth == 0) out.append(c)
      i += 1
    }
    out.toString
  }

  // ------------------------------------------------- [MS-XLS] / BIFF8

  // record ids (BIFF8, [MS-XLS] §2.3)
  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecSst = 0x00FC
  private val RecContinue = 0x003C
  private val RecLabelSst = 0x00FD
  private val RecBoundSheet = 0x0085

  /** One BIFF record: (id, payload extent) walk over a Workbook
    * stream. Returns (id, offset, length) triples; stops at the first
    * malformed header (degrade). */
  private def biffRecords(b: Array[Byte]): Seq[(Int, Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    var i = 0
    while (i + 4 <= b.length) {
      val id = u16(b, i)
      val len = u16(b, i + 2)
      if (len < 0 || i + 4 + len > b.length) return out.toSeq
      out += ((id, i + 4, len))
      i += 4 + len
    }
    out.toSeq
  }

  /** A cursor over the SST payload plus its CONTINUE payloads. String
    * CHARACTER data may split across a record boundary, and each
    * continuation restarts with a fresh grbit byte (the
    * compressed/UTF-16 flag may flip mid-string — [MS-XLS]
    * §2.5.293) — the one genuinely tricky part of BIFF8. */
  private final class SstCursor(parts: IndexedSeq[(Int, Int)], b: Array[Byte]) {
    private var p = 0
    private var off = 0
    private var fresh = false // true right after crossing into a new part
    private def partLen = parts(p)._2
    private def advance(): Boolean = {
      while (p < parts.length && off >= partLen) { p += 1; off = 0; fresh = true }
      p < parts.length
    }
    private def rawU8(): Int = {
      if (!advance()) return -1
      val v = b(parts(p)._1 + off) & 0xFF
      off += 1
      v
    }
    /** Header/skip reads: a boundary inside them carries no grbit. */
    def u8(): Int = { val v = rawU8(); fresh = false; v }
    def u16le(): Int = { val a = u8(); val c = u8(); if (a < 0 || c < 0) -1 else a | (c << 8) }
    def u32le(): Long = { val a = u16le(); val c = u16le(); if (a < 0 || c < 0) -1L else a.toLong | (c.toLong << 16) }
    def skip(n: Long): Unit = { var k = 0L; while (k < n && u8() >= 0) k += 1 }
    /** cch characters starting in `high` (UTF-16) vs compressed mode;
      * each part crossing DURING character data consumes a fresh grbit
      * byte that re-selects the mode for the remaining characters
      * ([MS-XLS] §2.5.293 — writers never split a 2-byte char). */
    def readChars(cch: Int, high0: Boolean): String = {
      val sb = new StringBuilder(cch)
      var high = high0
      var left = cch
      fresh = false // the mode byte for THIS fragment was already read
      while (left > 0) {
        if (!advance()) return sb.toString
        if (fresh) {
          fresh = false
          val g = rawU8()
          if (g < 0) return sb.toString
          fresh = false
          high = (g & 1) != 0
        }
        val c =
          if (high) {
            val lo = rawU8(); val hi = rawU8()
            if (lo < 0 || hi < 0) return sb.toString
            lo | (hi << 8)
          } else rawU8()
        if (c < 0) return sb.toString
        sb.append(c.toChar)
        left -= 1
      }
      sb.toString
    }
  }

  /** The shared-string table: SST + CONTINUE payloads decoded into
    * unique strings (rich-text runs and ext data skipped; compressed
    * and UTF-16 modes, mode flips at continuation boundaries). */
  private def parseSst(b: Array[Byte], recs: Seq[(Int, Int, Int)]): IndexedSeq[String] = {
    val at = recs.indexWhere(_._1 == RecSst)
    if (at < 0) return IndexedSeq.empty
    val parts = (recs(at) +: recs.drop(at + 1).takeWhile(_._1 == RecContinue))
      .map { case (_, o, l) => (o, l) }.toIndexedSeq
    val cur = new SstCursor(parts, b)
    cur.skip(4) // cstTotal
    val unique = cur.u32le()
    if (unique < 0 || unique > 1000000L) return IndexedSeq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0L
    var ok = true
    while (i < unique && ok) {
      val cch = cur.u16le()
      val grbit = cur.u8()
      if (cch < 0 || grbit < 0 || (grbit & 0xF2) != 0) ok = false
      else {
        val rich = (grbit & 0x08) != 0
        val ext = (grbit & 0x04) != 0
        val cRun = if (rich) cur.u16le() else 0
        val cbExt = if (ext) cur.u32le() else 0L
        out += cur.readChars(cch, (grbit & 1) != 0)
        cur.skip(4L * cRun + math.max(0L, cbExt))
      }
      i += 1
    }
    out.toIndexedSeq
  }

  /** Workbook-stream text ([MS-XLS]): worksheet substreams located by
    * the BoundSheet8 directory (lbPlyPos — sheets extract in TAB
    * order, not stream order), each substream's LabelSst cells grouped
    * by row (row-major, columns sorted), cells TAB-joined, rows and
    * sheets newline-joined — the same reading as [[OfficeZip]]'s XLSX
    * walk. Numeric cells are skipped (text extraction, stated).
    * BIFF8 interns every cell string in the SST, so LabelSst + SST is
    * the complete text path. */
  private[operators] def xlsText(wb: Array[Byte]): String = {
    val recs = biffRecords(wb)
    if (recs.isEmpty || recs.head._1 != RecBof) return ""
    val sst = parseSst(wb, recs)
    // BoundSheet8: sheet-substream offsets in tab order
    val sheetPos = recs.filter(_._1 == RecBoundSheet).map { case (_, o, l) =>
      if (l >= 4) u32(wb, o) else -1L
    }.filter(_ >= 0)
    // worksheet substream extents: BOF at offset → records until EOF
    def sheetText(bofAt: Long): String = {
      val start = recs.indexWhere(r => (r._2 - 4).toLong == bofAt && r._1 == RecBof)
      if (start < 0) return ""
      val body = recs.drop(start + 1).takeWhile(_._1 != RecEof)
      val rows = scala.collection.mutable.SortedMap.empty[Int,
        scala.collection.mutable.SortedMap[Int, String]]
      body.foreach { case (id, o, l) =>
        if (id == RecLabelSst && l >= 10) {
          val rw = u16(wb, o)
          val col = u16(wb, o + 2)
          val isst = u32(wb, o + 6)
          if (isst >= 0 && isst < sst.length) {
            val cells = rows.getOrElseUpdate(rw,
              scala.collection.mutable.SortedMap.empty[Int, String])
            cells(col) = sst(isst.toInt)
          }
        }
      }
      rows.valuesIterator
        .map(_.valuesIterator.filter(_.nonEmpty).mkString("\t"))
        .filter(_.nonEmpty).mkString("\n")
    }
    sheetPos.map(sheetText).filter(_.nonEmpty).mkString("\n")
  }

  // ------------------------------------------------- [MS-PPT] (legacy)

  private val PptTextChars = 0x0FA0 // TextCharsAtom: UTF-16LE
  private val PptTextBytes = 0x0FA8 // TextBytesAtom: single-byte cp1252

  /** `PowerPoint Document` stream text ([MS-PPT]): the record tree —
    * 8-byte headers (recVer low nibble 0xF = container, recurse),
    * TextCharsAtom (UTF-16LE) and TextBytesAtom (cp1252) leaves
    * collected in stream order, one per paragraph block; PPT's `\r`
    * paragraph marks read back as `\n`, blocks newline-joined. */
  private[operators] def pptText(b: Array[Byte]): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= until && depth < 32) {
        val verInst = u16(b, i)
        val recType = u16(b, i + 2)
        val len = u32(b, i + 4)
        if (len < 0 || i + 8 + len > until) return // truncated: degrade
        val payloadAt = i + 8
        if ((verInst & 0xF) == 0xF) walk(payloadAt, (payloadAt + len).toInt, depth + 1)
        else if (recType == PptTextChars && len % 2 == 0)
          parts += new String(b, payloadAt, len.toInt, "UTF-16LE")
        else if (recType == PptTextBytes)
          parts += new String(b, payloadAt, len.toInt, "windows-1252")
        i = (payloadAt + len).toInt
      }
    }
    walk(0, b.length, 0)
    parts.map(_.replace('\r', '\n')).filter(_.nonEmpty).mkString("\n")
  }

  // record type ids for the fixture writer (container values from
  // [MS-PPT] §2.13.24: Document container + a text container shape)
  private[operators] def pptRec(verInst: Int, recType: Int,
                                payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    putU16(out, 0, verInst); putU16(out, 2, recType)
    putU32(out, 4, payload.length.toLong)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  /** The l143 construction half: the document's text (with `\n` stored
    * as PPT's `\r` paragraph marks) as ONE text atom — TextCharsAtom
    * (UTF-16LE) on even ids or, when every unit fits a byte,
    * TextBytesAtom — nested inside a Document container within the
    * `PowerPoint Document` stream of an [MS-CFB] container. A sibling
    * atom of an UNKNOWN record type carries junk the walk must skip. */
  def syntheticPpt(docId: Long, text: String): MediaFile = {
    val stored = text.replace('\n', '\r')
    val chars = docId % 2 == 0 || stored.exists(_ >= 0x100)
    val atom =
      if (chars) pptRec(0x0000, PptTextChars, stored.getBytes("UTF-16LE"))
      else pptRec(0x0000, PptTextBytes, stored.map(c => (c & 0xFF).toByte).toArray)
    val junk = pptRec(0x0000, 0x0BC1, Array.fill[Byte](12)(0x5C)) // skipped
    val doc = pptRec(0x000F, 0x03E8, junk ++ atom) // Document container
    MediaFile(docId, buildCfb(Seq("PowerPoint Document" -> doc,
      "Current User" -> Array.fill[Byte](16)(0x20)), if (docId % 5 == 0) 12 else 9))
  }

  /** Full-document extraction; None when the payload is not a CFB.
    * Dispatch: a `WordDocument` stream → the [MS-DOC] piece-table walk
    * (container "doc"); a `Workbook`/`Book` stream → the BIFF8
    * walk (container "xls"); a `PowerPoint Document` stream → the
    * [MS-PPT] record-tree walk (container "ppt"); any other compound
    * file → empty text, container "cfb". */
  def parseDocText(m: MediaFile): Option[DocText] =
    parse(m.payload).map { cfb =>
      cfb.stream("WordDocument") match {
        case Some(wd) if u16(wd, 0) == 0xA5EC =>
          val text = (for {
            tbl <- cfb.stream(if ((u16(wd, 0x0A) & 0x0200) != 0) "1Table" else "0Table")
            t <- pieceTableText(wd, tbl)
          } yield t).getOrElse("")
          DocText(m.doc_id, text, text.length.toLong, "doc")
        case _ =>
          cfb.stream("Workbook").orElse(cfb.stream("Book")) match {
            case Some(wb) =>
              val text = try xlsText(wb) catch { case NonFatal(_) => "" }
              DocText(m.doc_id, text, text.length.toLong, "xls")
            case None =>
              cfb.stream("PowerPoint Document") match {
                case Some(pp) =>
                  val text = try pptText(pp) catch { case NonFatal(_) => "" }
                  DocText(m.doc_id, text, text.length.toLong, "ppt")
                case None => DocText(m.doc_id, "", 0L, "cfb")
              }
          }
      }
    }

  /** Stub fallback (non-CFB payload is data, not an error). */
  def decodeDocText(m: MediaFile): DocText =
    parseDocText(m).getOrElse(DocText(m.doc_id, "", 0L, "stub"))

  // ------------------------------------------ [MS-OLEPS] property sets

  /** Legacy Office metadata — the l112/l115 curation-gate fields for
    * the CFB family. `kind` is the [[parseDocText]] dispatch
    * ("doc"/"xls"/"ppt"/"cfb"); title/author/created come from the
    * `\u0005SummaryInformation` property-set stream ([MS-OLEPS],
    * public): property ids 2 (title), 4 (author), 12 (create time),
    * strings as VT_LPSTR (cp1252) or VT_LPWSTR (UTF-16LE), the
    * timestamp a FILETIME (100 ns since 1601) read back as epoch
    * seconds. Missing stream/properties yield ""/0 — metadata is
    * optional in real files. */
  final case class OleMeta(doc_id: Long, kind: String, title: String,
                           author: String, created_epoch: Long,
                           category: String, company: String)

  private val FiletimeEpochDelta = 11644473600L // 1601 → 1970, seconds

  private def olePropString(b: Array[Byte], at: Int): Option[String] = {
    val vt = u32(b, at)
    if (vt == 30L) { // VT_LPSTR: cch incl. NUL, cp1252 bytes
      val cch = u32(b, at + 4)
      if (cch <= 0 || at + 8 + cch > b.length) None
      else Some(new String(b, at + 8, (cch - 1).toInt, "windows-1252"))
    } else if (vt == 31L) { // VT_LPWSTR: cch incl. NUL, UTF-16LE
      val cch = u32(b, at + 4)
      if (cch <= 0 || at + 8 + 2 * cch > b.length) None
      else Some(new String(b, at + 8, 2 * (cch - 1).toInt, "UTF-16LE"))
    } else None
  }

  /** Walk the FIRST property-set section of an [MS-OLEPS] stream,
    * invoking `f(pid, valueOffset)` per id/offset pair — the shape
    * SummaryInformation and DocumentSummaryInformation share. */
  private def walkPropSet(b: Array[Byte])(f: (Long, Int) => Unit): Unit = {
    if (b.length < 48 || u16(b, 0) != 0xFFFE) return
    val nSections = u32(b, 24)
    if (nSections < 1) return
    val secAt = u32(b, 44).toInt // first section's offset (after its FMTID)
    if (secAt < 0 || secAt + 8 > b.length) return
    val nProps = u32(b, secAt + 4)
    var i = 0L
    while (i < math.min(nProps, 256L)) {
      val entry = secAt + 8 + (i * 8).toInt
      val pid = u32(b, entry)
      val off = u32(b, entry + 4)
      val at = secAt + off.toInt
      if (off > 0 && at + 4 <= b.length) f(pid, at)
      i += 1
    }
  }

  /** Parse one SummaryInformation stream; never throws (degrade). */
  private[operators] def summaryInfo(b: Array[Byte]): (String, String, Long) = {
    try {
      var title = ""; var author = ""; var created = 0L
      walkPropSet(b) { (pid, at) =>
        if (pid == 2L) title = olePropString(b, at).getOrElse(title)
        else if (pid == 4L) author = olePropString(b, at).getOrElse(author)
        else if (pid == 12L && u32(b, at) == 64L && at + 12 <= b.length) {
          val ft = u32(b, at + 4) | (u32(b, at + 8) << 32) // FILETIME LE
          created = ft / 10000000L - FiletimeEpochDelta
        }
      }
      (title, author, created)
    } catch { case NonFatal(_) => ("", "", 0L) }
  }

  /** The sibling `DocumentSummaryInformation` property set
    * ([MS-OSHARED] GKPIDDSI): pid 2 = category, pid 15 = company —
    * the other half of the legacy curation gate. Same walk, different
    * FMTID/pids; missing stream/properties degrade to "". */
  private[operators] def docSummaryInfo(b: Array[Byte]): (String, String) = {
    try {
      var category = ""; var company = ""
      walkPropSet(b) { (pid, at) =>
        if (pid == 2L) category = olePropString(b, at).getOrElse(category)
        else if (pid == 15L) company = olePropString(b, at).getOrElse(company)
      }
      (category, company)
    } catch { case NonFatal(_) => ("", "") }
  }

  /** Full metadata readout; None when the payload is not a CFB. */
  def parseOleMeta(m: MediaFile): Option[OleMeta] =
    parse(m.payload).map { cfb =>
      val kind =
        if (cfb.stream("WordDocument").exists(w => u16(w, 0) == 0xA5EC)) "doc"
        else if (cfb.stream("Workbook").orElse(cfb.stream("Book")).isDefined) "xls"
        else if (cfb.stream("PowerPoint Document").isDefined) "ppt"
        else "cfb"
      val (t, a, c) = cfb.stream("\u0005SummaryInformation")
        .map(summaryInfo).getOrElse(("", "", 0L))
      val (cat, comp) = cfb.stream("\u0005DocumentSummaryInformation")
        .map(docSummaryInfo).getOrElse(("", ""))
      OleMeta(m.doc_id, kind, t, a, c, cat, comp)
    }

  def decodeOleMeta(m: MediaFile): OleMeta =
    parseOleMeta(m).getOrElse(OleMeta(m.doc_id, "stub", "", "", 0L, "", ""))

  def extractMeta(files: Dataset[MediaFile]): Dataset[OleMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeOleMeta))
  }

  /** Construction half of the l144 metadata round trip: a real
    * [MS-OLEPS] SummaryInformation stream — property-set header with
    * the SummaryInformation FMTID, one section holding codepage
    * (VT_I2 1252), title (VT_LPWSTR — carries arbitrary Unicode),
    * author (VT_LPSTR cp1252), and create time (VT_FILETIME), values
    * 4-byte aligned. */
  private def pad4(a: Array[Byte]): Array[Byte] =
    if (a.length % 4 == 0) a else a ++ new Array[Byte]((4 - a.length % 4) % 4)
  private def lpwstr(s: String): Array[Byte] = {
    val chars = (s + "\u0000").getBytes("UTF-16LE")
    val out = new Array[Byte](8 + chars.length)
    putU32(out, 0, 31L); putU32(out, 4, (s.length + 1).toLong)
    System.arraycopy(chars, 0, out, 8, chars.length)
    pad4(out)
  }
  private def lpstr(s: String): Array[Byte] = {
    val bytes = s.map(c => (c & 0xFF).toByte).toArray :+ 0.toByte
    val out = new Array[Byte](8 + bytes.length)
    putU32(out, 0, 30L); putU32(out, 4, bytes.length.toLong)
    System.arraycopy(bytes, 0, out, 8, bytes.length)
    pad4(out)
  }

  private[operators] def olepsSummary(title: String, author: String,
                                      createdEpoch: Long): Array[Byte] = {
    val codepage = { val a = new Array[Byte](8); putU32(a, 0, 2L); putU16(a, 4, 1252); a }
    val ft = (createdEpoch + FiletimeEpochDelta) * 10000000L
    val filetime = {
      val a = new Array[Byte](12)
      putU32(a, 0, 64L)
      putU32(a, 4, ft & 0xFFFFFFFFL); putU32(a, 8, (ft >>> 32) & 0xFFFFFFFFL)
      a
    }
    olepsStream(
      Array(0xE0, 0x85, 0x9F, 0xF2, 0xF9, 0x4F, 0x68, 0x10,
        0xAB, 0x91, 0x08, 0x00, 0x2B, 0x27, 0xB3, 0xD9).map(_.toByte),
      Seq((1L, codepage), (2L, lpwstr(title)),
        (4L, lpstr(author)), (12L, filetime)))
  }

  /** The DocumentSummaryInformation construction twin: GKPIDDSI FMTID,
    * category as VT_LPSTR (cp1252) and company as VT_LPWSTR (carries
    * arbitrary Unicode — the load-bearing wide path of this set). */
  private[operators] def olepsDocSummary(category: String,
                                         company: String): Array[Byte] = {
    val codepage = { val a = new Array[Byte](8); putU32(a, 0, 2L); putU16(a, 4, 1252); a }
    olepsStream(
      Array(0x02, 0xD5, 0xCD, 0xD5, 0x9C, 0x2E, 0x1B, 0x10,
        0x93, 0x97, 0x08, 0x00, 0x2B, 0x2C, 0xF9, 0xAE).map(_.toByte),
      Seq((1L, codepage), (2L, lpstr(category)), (15L, lpwstr(company))))
  }

  /** One [MS-OLEPS] PropertySetStream: byte order, version, OS,
    * CLSID(0), ONE section at offset 48 under the given FMTID, the
    * section's id/offset table and 4-byte-aligned values. */
  private def olepsStream(fmtid: Array[Byte],
                          values: Seq[(Long, Array[Byte])]): Array[Byte] = {
    val headerLen = 8 + values.length * 8
    val offsets = values.map(_._2.length).scanLeft(headerLen)(_ + _).init
    val cb = headerLen + values.map(_._2.length).sum
    val sec = new Array[Byte](cb)
    putU32(sec, 0, cb.toLong); putU32(sec, 4, values.length.toLong)
    values.zip(offsets).zipWithIndex.foreach { case (((pid, v), off), i) =>
      putU32(sec, 8 + i * 8, pid); putU32(sec, 12 + i * 8, off.toLong)
      System.arraycopy(v, 0, sec, off, v.length)
    }
    val head = new Array[Byte](48)
    putU16(head, 0, 0xFFFE); putU16(head, 2, 0)
    putU32(head, 4, 0x00020005L)
    putU32(head, 24, 1L)
    System.arraycopy(fmtid, 0, head, 28, 16)
    putU32(head, 44, 48L)
    head ++ sec
  }

  /** The l144 construction half: a `.doc`-shaped compound file (the
    * l137 fixture streams) PLUS a SummaryInformation stream whose
    * title/author/created are doc_id arithmetic AND its sibling
    * DocumentSummaryInformation (GKPIDDSI category/company) — the
    * oracle restates all five in SQL. Title and company carry
    * non-cp1252 chars so both VT_LPWSTR paths are load-bearing. */
  def syntheticDocWithMeta(docId: Long, text: String): MediaFile = {
    val base = syntheticDoc(docId, text)
    val meta = olepsSummary(s"T世${docId % 97}", s"author-${docId % 7}",
      1600000000L + docId)
    val docMeta = olepsDocSummary(s"cat-${docId % 5}", s"C株${docId % 13}")
    // rebuild with the extra streams (buildCfb orders streams as given)
    val cfb = parse(base.payload).get
    val streams = cfb.entries.map(e => e.name -> cfb.stream(e.name).get) :+
      ("\u0005SummaryInformation" -> meta) :+
      ("\u0005DocumentSummaryInformation" -> docMeta)
    MediaFile(docId, buildCfb(streams, if (docId % 5 == 0) 12 else 9))
  }

  /** [[PdfText.extractText]]'s legacy-Office twin at the same
    * `mapPartitions` codec boundary. */
  def extractText(files: Dataset[MediaFile]): Dataset[DocText] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeDocText))
  }

  /** The l68-cascade adapter ([[PdfText.asDocuments]]'s twin): real
    * legacy-Office documents with non-empty text as an (id, text)
    * frame — the "optional .doc/.xls/.ppt ingest stage" in front of
    * the text pipeline. */
  def asDocuments(files: Dataset[MediaFile], idCol: String = "doc_id",
                  textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    extractText(files).toDF()
      .filter(col("container").isin("doc", "xls", "ppt") && col("n_chars") > 0)
      .select(col("doc_id").as(idCol), col("text").as(textCol))
  }

  // --------------------------------------------- construction (fixtures)

  /** Little-endian writers for the fixture builders. */
  private[operators] def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private[operators] def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  /** Build a CFB container around named streams — the construction
    * half of the l137 round trip, written independently from the
    * reader per the [MS-CFB] layout: header DIFAT (all FAT sectors fit
    * in the 109 header slots at fixture scale), FAT first, then
    * directory, miniFAT, mini-stream container, and large streams;
    * streams under 4096 bytes go to the 64-byte-sector mini stream
    * exactly as real writers place them, so SMALL documents exercise
    * the miniFAT path and large ones the FAT path. `sectorShift` 9 =
    * v3 (512), 12 = v4 (4096). */
  private[operators] def buildCfb(streams: Seq[(String, Array[Byte])],
                                  sectorShift: Int): Array[Byte] = {
    val ssz = 1 << sectorShift
    val cutoff = 4096
    val mini = streams.filter(_._2.length < cutoff)
    val large = streams.filter(_._2.length >= cutoff)
    def sectorsOf(len: Int, unit: Int) = (len + unit - 1) / unit
    // mini stream container: each mini stream padded to 64
    val miniLens = mini.map(_._2.length)
    val miniStarts = miniLens.scanLeft(0)((a, l) => a + sectorsOf(l, 64)).init
    val miniTotalSectors = miniLens.map(sectorsOf(_, 64)).sum
    val miniData = new Array[Byte](miniTotalSectors * 64)
    mini.zip(miniStarts).foreach { case ((_, d), s) =>
      System.arraycopy(d, 0, miniData, s * 64, d.length)
    }
    val nDirEntries = 1 + streams.length
    val nDirSectors = math.max(1, sectorsOf(nDirEntries * 128, ssz))
    val nMiniFatEntries = miniTotalSectors
    val nMiniFatSectors = sectorsOf(nMiniFatEntries * 4, ssz)
    val nMiniContSectors = sectorsOf(miniData.length, ssz)
    val largeSectorCounts = large.map(s => sectorsOf(s._2.length, ssz))
    val nonFat = nDirSectors + nMiniFatSectors + nMiniContSectors + largeSectorCounts.sum
    val perFat = ssz / 4
    var nFat = 1
    while (nFat * perFat < nonFat + nFat) nFat += 1
    require(nFat <= 109, "fixture scale fits the header DIFAT")
    // sector numbering: FAT 0..nFat-1, dir, miniFAT, mini container, larges
    val dirStart = nFat
    val miniFatStart = dirStart + nDirSectors
    val miniContStart = miniFatStart + nMiniFatSectors
    val largeStarts = largeSectorCounts.scanLeft(miniContStart + nMiniContSectors)(_ + _).init
    val totalSectors = nFat + nonFat
    val fat = Array.fill[Long](nFat * perFat)(FreeSect)
    (0 until nFat).foreach(i => fat(i) = 0xFFFFFFFDL) // FATSECT marker
    def chain(start: Int, count: Int): Unit = {
      var i = 0
      while (i < count) {
        fat(start + i) = if (i == count - 1) EndOfChain else (start + i + 1).toLong
        i += 1
      }
    }
    chain(dirStart, nDirSectors)
    if (nMiniFatSectors > 0) chain(miniFatStart, nMiniFatSectors)
    if (nMiniContSectors > 0) chain(miniContStart, nMiniContSectors)
    largeStarts.zip(largeSectorCounts).foreach { case (s, c) => chain(s, c) }
    val miniFat = Array.fill[Long](math.max(1, nMiniFatSectors) * perFat)(FreeSect)
    mini.indices.foreach { i =>
      val s = miniStarts(i); val c = sectorsOf(miniLens(i), 64)
      var k = 0
      while (k < c) {
        miniFat(s + k) = if (k == c - 1) EndOfChain else (s + k + 1).toLong
        k += 1
      }
    }
    // directory entries: Root Entry(0) then streams in caller order,
    // root.child = 1, entry i right-sibling = i+1 (a legal, if
    // unbalanced, red-black tree readers accept)
    val dir = new Array[Byte](nDirSectors * ssz)
    java.util.Arrays.fill(dir, 0.toByte)
    def dirEntry(idx: Int, name: String, objType: Int, start: Long, size: Long,
                 child: Long, right: Long): Unit = {
      val off = idx * 128
      val nm = name.getBytes("UTF-16LE")
      System.arraycopy(nm, 0, dir, off, math.min(nm.length, 62))
      putU16(dir, off + 64, nm.length + 2)
      dir(off + 66) = objType.toByte
      dir(off + 67) = 1 // black
      putU32(dir, off + 68, NoStream) // left
      putU32(dir, off + 72, right)
      putU32(dir, off + 76, child)
      putU32(dir, off + 116, start)
      putU32(dir, off + 120, size)
      putU32(dir, off + 124, 0L)
    }
    dirEntry(0, "Root Entry", 5,
      if (nMiniContSectors > 0) miniContStart.toLong else EndOfChain,
      miniData.length.toLong, child = if (streams.nonEmpty) 1L else NoStream,
      right = NoStream)
    var largeIdx = 0
    var miniIdx = 0
    streams.zipWithIndex.foreach { case ((name, data), i) =>
      val (start, size) =
        if (data.length < cutoff) {
          val s = miniStarts(miniIdx).toLong; miniIdx += 1; (s, data.length.toLong)
        } else {
          val s = largeStarts(largeIdx).toLong; largeIdx += 1; (s, data.length.toLong)
        }
      dirEntry(1 + i, name, 2, start, size, child = NoStream,
        right = if (i == streams.length - 1) NoStream else (2 + i).toLong)
    }
    // header (512 bytes; v4 pads to one full 4096 sector)
    val headerLen = if (ssz == 512) 512 else ssz
    val out = new Array[Byte](headerLen + totalSectors * ssz)
    System.arraycopy(Signature, 0, out, 0, 8)
    putU16(out, 0x18, 0x003E) // minor
    putU16(out, 0x1A, if (ssz == 512) 3 else 4) // major version
    putU16(out, 0x1C, 0xFFFE) // little-endian marker
    putU16(out, 0x1E, sectorShift)
    putU16(out, 0x20, 6) // mini sector shift
    if (ssz != 512) putU32(out, 0x28, nDirSectors.toLong) // v4 only
    putU32(out, 0x2C, nFat.toLong)
    putU32(out, 0x30, dirStart.toLong)
    putU32(out, 0x38, cutoff.toLong)
    putU32(out, 0x3C, if (nMiniFatSectors > 0) miniFatStart.toLong else EndOfChain)
    putU32(out, 0x40, nMiniFatSectors.toLong)
    putU32(out, 0x44, EndOfChain) // no DIFAT sectors
    putU32(out, 0x48, 0L)
    (0 until 109).foreach(i =>
      putU32(out, 0x4C + i * 4, if (i < nFat) i.toLong else FreeSect))
    def writeSectors(firstSector: Int, data: Array[Byte]): Unit =
      System.arraycopy(data, 0, out, headerLen + firstSector * ssz, data.length)
    val fatBytes = new Array[Byte](nFat * ssz)
    fat.indices.foreach(i => putU32(fatBytes, i * 4, fat(i)))
    writeSectors(0, fatBytes)
    writeSectors(dirStart, dir)
    if (nMiniFatSectors > 0) {
      val mfBytes = new Array[Byte](nMiniFatSectors * ssz)
      (0 until nMiniFatSectors * perFat).foreach(i =>
        putU32(mfBytes, i * 4, if (i < miniFat.length) miniFat(i) else FreeSect))
      writeSectors(miniFatStart, mfBytes)
    }
    if (nMiniContSectors > 0) writeSectors(miniContStart, miniData)
    large.zip(largeStarts).foreach { case ((_, d), s) => writeSectors(s, d) }
    out
  }

  // ------------------------------------------- BIFF8 construction side

  private[operators] def biffRec(id: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + payload.length)
    putU16(out, 0, id); putU16(out, 2, payload.length)
    System.arraycopy(payload, 0, out, 4, payload.length)
    out
  }

  private[operators] def biffBof(dt: Int): Array[Byte] = {
    val p = new Array[Byte](16)
    putU16(p, 0, 0x0600) // BIFF8
    putU16(p, 2, dt)     // 0x0005 globals / 0x0010 worksheet
    putU16(p, 4, 0x0DBB); putU16(p, 6, 0x07CC)
    biffRec(RecBof, p)
  }

  private[operators] def biffEof: Array[Byte] = biffRec(RecEof, Array.emptyByteArray)

  /** XLUnicodeRichExtendedString body (no rich/ext): cch, grbit,
    * chars — compressed when `high` is false (all units must be
    * < 0x100), UTF-16LE otherwise. */
  private[operators] def sstString(s: String, high: Boolean): Array[Byte] = {
    val chars =
      if (high) s.getBytes("UTF-16LE")
      else s.map(c => (c & 0xFF).toByte).toArray
    val out = new Array[Byte](3 + chars.length)
    putU16(out, 0, s.length)
    out(2) = if (high) 1 else 0
    System.arraycopy(chars, 0, out, 3, chars.length)
    out
  }

  private[operators] def biffSst(strings: Seq[(String, Boolean)]): Array[Byte] = {
    val body = strings.map { case (s, h) => sstString(s, h) }
    val p = new Array[Byte](8 + body.map(_.length).sum)
    putU32(p, 0, strings.length.toLong)
    putU32(p, 4, strings.length.toLong)
    var o = 8
    body.foreach { bb => System.arraycopy(bb, 0, p, o, bb.length); o += bb.length }
    biffRec(RecSst, p)
  }

  private[operators] def biffLabelSst(row: Int, colIdx: Int, isst: Int): Array[Byte] = {
    val p = new Array[Byte](10)
    putU16(p, 0, row); putU16(p, 2, colIdx); putU16(p, 4, 0)
    putU32(p, 6, isst.toLong)
    biffRec(RecLabelSst, p)
  }

  private[operators] def biffBoundSheet(pos: Long, name: String): Array[Byte] = {
    val nm = name.map(c => (c & 0xFF).toByte).toArray
    val p = new Array[Byte](8 + nm.length)
    putU32(p, 0, pos)
    p(4) = 0; p(5) = 0 // visible worksheet
    p(6) = name.length.toByte; p(7) = 0 // compressed sheet name
    System.arraycopy(nm, 0, p, 8, nm.length)
    biffRec(RecBoundSheet, p)
  }

  /** The l141 construction half: wrap a document's text into a real
    * [MS-XLS] BIFF8 workbook — globals substream (BOF, BoundSheet8
    * directory, SST holding the text as ONE shared string, EOF) + one
    * worksheet substream (BOF, a LabelSst cell referencing it, EOF) —
    * inside an [MS-CFB] container under the `Workbook` stream name.
    * `doc_id % 2` picks the SST encoding (UTF-16 vs compressed — the
    * compressed form only when every unit fits a byte), `doc_id % 5`
    * the v4 sector size, so both string modes and both container
    * generations appear across the corpus. */
  def syntheticXls(docId: Long, text: String): MediaFile = {
    val high = docId % 2 == 0 || text.exists(_ >= 0x100)
    val globalsFixed = biffBof(0x0005)
    val sst = biffSst(Seq((text, high)))
    // BoundSheet8 length is independent of lbPlyPos: compute the sheet
    // offset with a placeholder, then write the real one
    val bsPlaceholder = biffBoundSheet(0L, "S1")
    val sheetAt = globalsFixed.length + bsPlaceholder.length + sst.length + biffEof.length
    val globals = globalsFixed ++ biffBoundSheet(sheetAt.toLong, "S1") ++ sst ++ biffEof
    val sheet = biffBof(0x0010) ++ biffLabelSst(0, 0, 0) ++ biffEof
    MediaFile(docId,
      buildCfb(Seq("Workbook" -> (globals ++ sheet)), if (docId % 5 == 0) 12 else 9))
  }

  /** The l137 construction half: wrap a document's text into a real
    * [MS-DOC]-shaped compound file. The text (with `\n` stored as
    * Word's `\r` paragraph marks) splits into PIECES of ~48 UTF-16
    * units (never splitting a surrogate pair): ASCII-only pieces are
    * stored COMPRESSED (8-bit cp1252, `fc` bit 30 set, offset = fc/2)
    * and the rest UTF-16LE — so a reader that ignores fCompressed, the
    * piece order, or the CP arithmetic fails visibly. `doc_id % 2`
    * picks the `1Table`/`0Table` stream (the fWhichTblStm flag is
    * load-bearing), `doc_id % 3 == 0` prepends a Prc block the Clx
    * walk must skip, and `doc_id % 5 == 0` writes a v4 (4096-byte
    * sector) container. Small documents land in the MINI stream,
    * large ones in FAT sectors — both real-writer placements. */
  def syntheticDoc(docId: Long, text: String): MediaFile = {
    val storedPlain = text.replace('\n', '\r')
    // plant a FIELD around the second half ([MS-DOC] §2.8.25 — the
    // shape every real document carries): begin mark + the HYPERLINK
    // field CODE (which must NOT surface as text) + separator, the
    // display text, end mark. A reader that emits field codes or the
    // marks themselves fails the verbatim oracle visibly.
    val stored =
      if (storedPlain.length < 8) storedPlain
      else {
        var mid = storedPlain.length / 2
        if (Character.isHighSurrogate(storedPlain.charAt(mid - 1))) mid += 1
        storedPlain.substring(0, mid) +
          "\u0013 HYPERLINK \"http://corpus.example/doc\" \u0014" +
          storedPlain.substring(mid) + "\u0015"
      }
    // piece split at ~48 units, respecting surrogate pairs
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    while (bounds.last < stored.length) {
      var next = math.min(bounds.last + 48, stored.length)
      if (next < stored.length && Character.isHighSurrogate(stored.charAt(next - 1)))
        next += 1
      bounds += next
    }
    val pieces = bounds.init.zip(bounds.tail).map { case (a, b) => stored.substring(a, b) }
      .filter(_.nonEmpty)
    val fibLen = 1024
    val textBytes = new java.io.ByteArrayOutputStream()
    val pcds = pieces.map { p =>
      val ascii = p.forall(_ < 0x80)
      val off = fibLen + textBytes.size
      if (ascii) {
        textBytes.write(p.getBytes("windows-1252"))
        (p.length, (off.toLong * 2) | (1L << 30))
      } else {
        textBytes.write(p.getBytes("UTF-16LE"))
        (p.length, off.toLong)
      }
    }
    val wd = new Array[Byte](fibLen + textBytes.size)
    System.arraycopy(textBytes.toByteArray, 0, wd, fibLen, textBytes.size)
    putU16(wd, 0, 0xA5EC) // wIdent
    putU16(wd, 2, 0x00C1) // nFib: Word 97
    val useOneTable = docId % 2 == 0
    putU16(wd, 0x0A, if (useOneTable) 0x0200 else 0x0000)
    // table stream: optional Prc distractor, then Pcdt
    val n = pcds.length
    val lcbPlc = 4L * (n + 1) + 8L * n
    val prc = if (docId % 3 == 0) 7 else 0 // 01 + cb(2) + 4 payload bytes
    val tbl = new Array[Byte](prc + 1 + 4 + lcbPlc.toInt)
    var t = 0
    if (prc > 0) {
      tbl(0) = 1; putU16(tbl, 1, 4)
      putU32(tbl, 3, 0xDEADBEEFL) // grpprl payload the walk must skip
      t = prc
    }
    tbl(t) = 2
    putU32(tbl, t + 1, lcbPlc)
    var cp = 0L
    pcds.zipWithIndex.foreach { case ((len, _), i) =>
      putU32(tbl, t + 5 + i * 4, cp); cp += len
      if (i == n - 1) putU32(tbl, t + 5 + n * 4, cp)
    }
    pcds.zipWithIndex.foreach { case ((_, fcWord), i) =>
      val off = t + 5 + (n + 1) * 4 + i * 8
      putU16(tbl, off, 0)
      putU32(tbl, off + 2, fcWord)
      putU16(tbl, off + 6, 0)
    }
    putU32(wd, 0x01A2, 0L) // fcClx: Clx starts at table offset 0... see below
    // fcClx points at the Clx INSIDE the table stream — offset 0 here
    // (the Prc distractor is part of the Clx, which the walk skips)
    putU32(wd, 0x01A6, tbl.length.toLong)
    val streams = Seq(
      "WordDocument" -> wd,
      (if (useOneTable) "1Table" else "0Table") -> tbl,
      // a distractor table stream of the WRONG name: a reader that
      // ignores fWhichTblStm and grabs the other stream fails visibly
      (if (useOneTable) "0Table" else "1Table") -> Array.fill[Byte](16)(0x5A))
    MediaFile(docId, buildCfb(streams, if (docId % 5 == 0) 12 else 9))
  }
}
