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
 * Degradation, never exceptions (the crawl decode contract): no CFB
 * signature → stub; a readable container without a `WordDocument`
 * stream (a `.xls`, `.ppt`, or any other CFB) → empty text, container
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
    // extractor applies)
    Some(out.toString.replace('\r', '\n'))
  }

  /** Full-document extraction; None when the payload is not a CFB. */
  def parseDocText(m: MediaFile): Option[DocText] =
    parse(m.payload).map { cfb =>
      val text = (for {
        wd <- cfb.stream("WordDocument")
        flags = u16(wd, 0x0A)
        tblName = if ((flags & 0x0200) != 0) "1Table" else "0Table"
        tbl <- cfb.stream(tblName)
        t <- pieceTableText(wd, tbl)
      } yield t).getOrElse("")
      val isDoc = cfb.stream("WordDocument").exists(w => u16(w, 0) == 0xA5EC)
      DocText(m.doc_id, text, text.length.toLong, if (isDoc) "doc" else "cfb")
    }

  /** Stub fallback (non-CFB payload is data, not an error). */
  def decodeDocText(m: MediaFile): DocText =
    parseDocText(m).getOrElse(DocText(m.doc_id, "", 0L, "stub"))

  /** [[PdfText.extractText]]'s legacy-Word twin at the same
    * `mapPartitions` codec boundary. */
  def extractText(files: Dataset[MediaFile]): Dataset[DocText] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.map(decodeDocText))
  }

  // --------------------------------------------- construction (fixtures)

  /** Little-endian writers for the fixture builder. */
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
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
    val stored = text.replace('\n', '\r')
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
