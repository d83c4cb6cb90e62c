package graft.sources

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZFile, SevenZMethod, SevenZMethodConfiguration, SevenZOutputFile}
import org.apache.commons.compress.utils.SeekableInMemoryByteChannel
import org.apache.spark.sql.Dataset

/**
 * 7z archive member extraction — the tail of the distribution-format
 * story after tar (l145) and zip (l147): academic bundles and some
 * mirror drops ship `.7z`. Unlike the hand-rolled tar/zip/WARC walks,
 * the 7z CONTAINER (LZMA2-coded header tables, solid folders, BCJ
 * filter chains) is decoded by Apache commons-compress — a PUBLIC
 * library Spark itself bundles (`commons-compress-1.28.0.jar`, the
 * same dependency posture as the zstd-jni/xz codec legs, SURVEY §7.6)
 * — because re-implementing LZMA would be codec work, not engine work.
 * This module owns the ENGINE-side contract around it: bounded
 * retention, the degrade ladder, and the listed-vs-readable split.
 *
 * Contract (mirrors [[Zip.members]]):
 *  - every non-directory member surfaces as (file_id, member_idx,
 *    name, size, text_head) in archive order;
 *  - retention is bounded by `headBytes` per member (content past it
 *    is never materialized) and the decoder's own allocations by a
 *    1 GiB memory limit — 7z needs random access (the header table
 *    lives at the end), so the in-memory-channel posture matches ZIP,
 *    which is defensible where tar's was not;
 *  - listing and readability are SEPARATE facts: members whose
 *    content cannot be decoded (password-protected AES-256 entries,
 *    corrupt folders) still surface with an EMPTY head — the walk
 *    falls back from content reading to the metadata table;
 *  - malformed input = prefix semantics, never a throw.
 */
object SevenZ {

  final case class SevenZMember(file_id: Long, member_idx: Long, name: String,
                                size: Long, text_head: String)

  private val MaxMembers = 1 << 20

  /** Pure single-archive walk (unit-testable without Spark). */
  def parseArchive(fileId: Long, payload: Array[Byte],
                   headBytes: Int): Seq[SevenZMember] = {
    try {
      val sz = SevenZFile.builder()
        .setSeekableByteChannel(new SeekableInMemoryByteChannel(payload))
        .setMaxMemoryLimitKiB(1 << 20) // decoder-allocation bound: 1 GiB
        .setTryToRecoverBrokenArchives(false)
        .get()
      try {
        // metadata first (names/sizes/directory flags come from the
        // header table, no content decode): if content reading fails
        // mid-archive — password-protected members throw — the
        // remaining members still LIST with empty heads
        val metas = sz.getEntries.asScala.toVector.take(MaxMembers)
        val heads = scala.collection.mutable.Map.empty[Int, String]
        try {
          var i = 0
          var e = sz.getNextEntry
          val buf = new Array[Byte](64 << 10)
          while (e != null && i < metas.length) {
            if (!e.isDirectory) {
              val keep = math.min(math.max(e.getSize, 0L), headBytes.toLong).toInt
              val head = new java.io.ByteArrayOutputStream(math.min(keep, 1 << 16))
              var left = keep
              var n = 0
              while (left > 0 && n >= 0) {
                n = sz.read(buf, 0, math.min(left, buf.length))
                if (n > 0) { head.write(buf, 0, n); left -= n }
              }
              heads(i) = new String(head.toByteArray, "UTF-8")
            }
            i += 1
            e = sz.getNextEntry
          }
        } catch { case NonFatal(_) => () } // unreadable content: listed below
        var idx = 0L
        metas.zipWithIndex.collect { case (m, i) if !m.isDirectory =>
          val r = SevenZMember(fileId, idx, m.getName, m.getSize,
            heads.getOrElse(i, ""))
          idx += 1
          r
        }
      } finally sz.close()
    } catch { case NonFatal(_) => Seq.empty } // malformed container
  }

  /** The distributed form — [[Zip.members]]' 7z twin. */
  def members(files: Dataset[WarcFile], headBytes: Int = 1 << 20): Dataset[SevenZMember] = {
    import files.sparkSession.implicits._
    files.flatMap(f => parseArchive(f.file_id, f.payload, headBytes))
  }

  // --------------------------------------------- construction (fixtures)

  /** The l151 construction half: one `.7z` holding the document's text
    * THREE times behind a directory entry that must be skipped —
    * `docs/<id>.txt` (LZMA2, the 7z default), `docs/<id>.c.txt` (COPY)
    * and `docs/<id>.b.txt` (BZIP2-in-7z) — so all three per-member
    * coder paths are load-bearing on every row. */
  def synthetic7z(fileId: Long, text: String): WarcFile = {
    val body = text.getBytes("UTF-8")
    val ch = new SeekableInMemoryByteChannel()
    val z = new SevenZOutputFile(ch)
    // the same construction-side lesson as the xz fixture leg
    // (Tar.xz): the default LZMA2 preset carries an 8 MiB dictionary
    // PER MEMBER — measured 41 s/sf0.1 for this query before tuning,
    // ~1 s after. Preset 0 + minimal dict on the writer; the reader
    // side honors whatever the archive declares.
    val lzma2 = {
      val o = new org.tukaani.xz.LZMA2Options(0)
      o.setDictSize(org.tukaani.xz.LZMA2Options.DICT_SIZE_MIN)
      new SevenZMethodConfiguration(SevenZMethod.LZMA2, o)
    }
    val bzip2 = // blockSize 1 (100 KB), not the default 900 KB work area
      new SevenZMethodConfiguration(SevenZMethod.BZIP2, Int.box(1))
    def add(name: String, cfg: SevenZMethodConfiguration): Unit = {
      val e = new SevenZArchiveEntry()
      e.setName(name)
      e.setContentMethods(cfg)
      z.putArchiveEntry(e)
      z.write(body)
      z.closeArchiveEntry()
    }
    val dir = new SevenZArchiveEntry()
    dir.setName("docs"); dir.setDirectory(true)
    z.putArchiveEntry(dir); z.closeArchiveEntry()
    add(s"docs/$fileId.txt", lzma2)
    add(s"docs/$fileId.c.txt", new SevenZMethodConfiguration(SevenZMethod.COPY))
    add(s"docs/$fileId.b.txt", bzip2)
    z.close()
    WarcFile(fileId, java.util.Arrays.copyOf(ch.array(), ch.size().toInt))
  }

  /** Password-protected construction (AES-256-SHA-256 content coder):
    * the spec's listed-but-unreadable leg. */
  private[sources] def syntheticEncrypted7z(fileId: Long, text: String,
                                            password: String): Array[Byte] = {
    val ch = new SeekableInMemoryByteChannel()
    val z = new SevenZOutputFile(ch, password.toCharArray)
    val e = new SevenZArchiveEntry()
    e.setName(s"docs/$fileId.locked.txt")
    z.putArchiveEntry(e)
    z.write(text.getBytes("UTF-8"))
    z.closeArchiveEntry()
    z.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }
}
