package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset

/**
 * TAR (ustar, POSIX.1-1988 — public) member extraction: the container
 * dataset distributions actually ship in (fixture tarballs, HF-style
 * text dumps, arXiv source bundles). Each archive is a sequence of
 * 512-byte header blocks — name (100 bytes, NUL-padded), size (12
 * bytes of OCTAL ASCII), typeflag ('0'/NUL = regular file, '5' =
 * directory, 'x'/'g' = pax extended headers), `ustar` magic at offset
 * 257 — each followed by ceil(size/512) content blocks; two zero
 * blocks end the archive.
 *
 * The walk surfaces regular-file members as (file_id, member_idx,
 * name, size, UTF-8 text head); directories and pax/extended headers
 * are SKIPPED but their payload blocks are correctly stepped over (the
 * classic tar-walk bug is treating a pax header's payload as a
 * member). gzip-, zstd-, and xz-wrapped archives (`.tar.gz` /
 * `.tar.zst` / `.tar.xz`, sniffed by magic bytes) decompress
 * transparently with the same 1 GiB bomb cap as [[Warc]] — zstd/xz via
 * the public zstd-jni / org.tukaani.xz libraries Spark bundles.
 * Malformed input = prefix
 * semantics: every member before the first bad header is emitted.
 *
 * Scale: one narrow flatMap per archive — the [[Warc.records]]
 * geometry; member bodies never exceed the caller's `headBytes`
 * retention in memory.
 */
object Tar {

  final case class TarMember(file_id: Long, member_idx: Long, name: String,
                             size: Long, text_head: String)

  private val MaxBytes = 1L << 30 // decompression bomb cap

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xFF
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (seen) return v // NUL/space terminator
      i += 1
    }
    if (seen) v else -1L
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, "UTF-8")
  }

  private def magic(b: Array[Byte], m: Int*): Boolean =
    b.length >= m.length && m.zipWithIndex.forall { case (v, i) => (b(i) & 0xFF) == v }

  /** Transparent decompression by magic bytes: gzip (`java.util.zip`),
    * zstd and xz via the PUBLIC zstd-jni / org.tukaani.xz libraries
    * Spark itself bundles — the `.tar.gz`/`.tar.zst`/`.tar.xz` shapes
    * HF-era dataset distributions actually ship. All three drain
    * through the same 1 GiB bomb cap; a corrupt stream yields None
    * (no members, never a throw). Plain payloads pass through. */
  private[sources] def decompress(payload: Array[Byte]): Option[Array[Byte]] = {
    def drain(in: java.io.InputStream): Array[Byte] =
      try {
        val out = new java.io.ByteArrayOutputStream(
          math.min(math.max(payload.length * 4L, 1 << 16), 1L << 22).toInt)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n > 0 && out.size < MaxBytes) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    try {
      val src = new java.io.ByteArrayInputStream(payload)
      if (magic(payload, 0x1F, 0x8B))
        Some(drain(new java.util.zip.GZIPInputStream(src)))
      else if (magic(payload, 0x28, 0xB5, 0x2F, 0xFD))
        Some(drain(new com.github.luben.zstd.ZstdInputStream(src)))
      else if (magic(payload, 0xFD, '7', 'z', 'X', 'Z', 0x00))
        // memory limit in KiB — the same 1 GiB cap, enforced inside xz
        Some(drain(new org.tukaani.xz.XZInputStream(src, 1 << 20)))
      else Some(payload)
    } catch { case NonFatal(_) => None }
  }

  /** Pure single-archive walk (unit-testable without Spark). */
  def parseArchive(fileId: Long, payload: Array[Byte],
                   headBytes: Int): Seq[TarMember] = {
    val bytes = decompress(payload).getOrElse(return Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer[TarMember]()
    var at = 0
    var idx = 0L
    // A GNU 'L' longname or a PAX `path=` record overrides the NEXT
    // member's (100-byte-truncated) header name — arXiv source bundles
    // and HF dumps routinely exceed 100-char paths.
    var pendingName: Option[String] = None
    try {
      while (at + 512 <= bytes.length) {
        // two zero blocks end the archive; one zero name byte on a
        // zero block is the practical end test
        if (bytes(at) == 0) return out.toSeq
        val name = cstr(bytes, at, 100)
        val size = octal(bytes, at + 124, 12)
        val typeflag = bytes(at + 156) & 0xFF
        if (size < 0 || name.isEmpty) return out.toSeq // malformed: prefix
        val contentAt = at + 512
        // Long throughout: a malformed 12-digit octal size (~6.9e10)
        // overflows Int blocks*512 — a wrap to <= at would loop forever
        // appending the same member on untrusted crawl input.
        val next = contentAt.toLong + ((size + 511L) / 512L) * 512L
        if (typeflag == '0' || typeflag == 0) {
          val keep = math.min(size, math.min(headBytes.toLong,
            math.max(0, bytes.length - contentAt).toLong)).toInt
          out += TarMember(fileId, idx, pendingName.getOrElse(name), size,
            new String(bytes, contentAt, keep, "UTF-8"))
          pendingName = None
          idx += 1
        } else if (typeflag == 'L') { // GNU longname: payload names the next member
          val keep = math.min(size,
            math.max(0, bytes.length - contentAt).toLong).toInt
          pendingName = Some(cstr(bytes, contentAt, keep))
        } else if (typeflag == 'x') { // pax extended header: `path=` wins
          val keep = math.min(size,
            math.max(0, bytes.length - contentAt).toLong).toInt
          paxPath(bytes, contentAt, keep).foreach(p => pendingName = Some(p))
        } // '5' dir, 'g' pax-global: stepped over, not emitted
        if (next > bytes.length.toLong || next <= at) return out.toSeq
        at = next.toInt
      }
    } catch { case NonFatal(_) => () } // malformed: prefix semantics
    out.toSeq
  }

  /** PAX records are `"%d %s=%s\n"` where the decimal length counts the
    * WHOLE record including itself, the space and the newline; returns
    * the last `path=` value if present. */
  private def paxPath(b: Array[Byte], off: Int, len: Int): Option[String] = {
    var at = off
    val end = off + len
    var found: Option[String] = None
    while (at < end) {
      var sp = at
      while (sp < end && b(sp) != ' ') sp += 1
      if (sp >= end) return found
      val recLen =
        try new String(b, at, sp - at, "US-ASCII").trim.toInt
        catch { case NonFatal(_) => return found }
      if (recLen <= 0 || at + recLen > end) return found
      val kv = new String(b, sp + 1, at + recLen - sp - 2, "UTF-8") // drop '\n'
      val eq = kv.indexOf('=')
      if (eq > 0 && kv.substring(0, eq) == "path")
        found = Some(kv.substring(eq + 1))
      at += recLen
    }
    found
  }

  /** The distributed form — [[Warc.records]]' tar twin. */
  def members(files: Dataset[WarcFile], headBytes: Int = 1 << 20): Dataset[TarMember] = {
    import files.sparkSession.implicits._
    files.flatMap(f => parseArchive(f.file_id, f.payload, headBytes))
  }

  // --------------------------------------------- construction (fixtures)

  private def headerBlock(name: String, size: Long, typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](512)
    val nm = name.getBytes("UTF-8")
    System.arraycopy(nm, 0, h, 0, math.min(nm.length, 100))
    def oct(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      padded.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => h(off + i) = b }
      h(off + len - 1) = 0
    }
    oct(420, 100, 8) // mode 0644
    oct(0, 108, 8); oct(0, 116, 8) // uid/gid
    oct(size, 124, 12)
    oct(1600000000L, 136, 12) // mtime
    h(156) = typeflag
    "ustar\u000000".getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => h(257 + i) = b }
    // checksum: spaces while summing, then octal + NUL + space
    (148 until 156).foreach(i => h(i) = ' ')
    val sum = h.map(_ & 0xFF).sum
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    padded.getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => h(148 + i) = b }
    h(154) = 0; h(155) = ' '
    h
  }

  private def pad512(data: Array[Byte]): Array[Byte] =
    if (data.length % 512 == 0) data
    else data ++ new Array[Byte](512 - data.length % 512)

  /** PAX `"%d %s=%s\n"` record where the decimal length counts the
    * whole record including its own digits (construction side). */
  private def paxRecord(key: String, value: String): String = {
    val base = s" $key=$value\n".getBytes("UTF-8").length
    var len = base + 1
    while (len.toString.length + base != len) len = len.toString.length + base
    s"$len $key=$value\n"
  }

  /** The >100-char member path both long-name mechanisms carry. */
  def longPath(fileId: Long): String = s"docs/${"d" * 96}/$fileId.txt"

  /** The l145 construction half: one `.tar` (wrapping rotated by
    * id % 4: gzip / plain / zstd / xz)
    * holding the document's text as `docs/<id>.txt`, preceded by a
    * DIRECTORY entry and a PAX extended header whose payload must be
    * stepped over, not emitted as a member — the classic tar-walk
    * bugs, made load-bearing. A SECOND copy of the text follows under
    * a >100-char path (routine in arXiv source bundles): carried by a
    * GNU 'L' longname entry on even ids and a PAX `path=` record on
    * odd ids, with the header field holding only the 100-byte
    * truncation — a walk that ignores the override surfaces the
    * truncated name and fails the oracle. */
  def syntheticTar(fileId: Long, text: String): WarcFile = {
    val body = text.getBytes("UTF-8")
    val pax = "29 mtime=1600000001.000000\n".getBytes("UTF-8")
    val long = longPath(fileId)
    val longBytes = (long + "\u0000").getBytes("UTF-8") // gnu: size includes NUL
    val longLeg =
      if (fileId % 2 == 0)
        headerBlock("././@LongLink", longBytes.length.toLong, 'L') ++ pad512(longBytes)
      else {
        // two records: the mtime record forces the multi-record walk
        val p = (paxRecord("mtime", "1600000002.000000") +
          paxRecord("path", long)).getBytes("UTF-8")
        headerBlock("pax_path", p.length.toLong, 'x') ++ pad512(p)
      }
    val raw =
      headerBlock("docs/", 0L, '5') ++
        headerBlock("pax_header", pax.length.toLong, 'x') ++ pad512(pax) ++
        headerBlock(s"docs/$fileId.txt", body.length.toLong, '0') ++ pad512(body) ++
        longLeg ++
        headerBlock(long.take(100), body.length.toLong, '0') ++ pad512(body) ++
        new Array[Byte](1024) // the two terminating zero blocks
    WarcFile(fileId, (fileId % 4) match {
      case 0 => WarcFixtures.gz(raw)
      case 1 | -1 => raw
      case 2 | -2 => zstd(raw)
      case _ => xz(raw)
    })
  }

  /** The l149 construction half: ONE archive holding MANY documents —
    * the geometry real distributions ship (thousands of members per
    * tarball, not one). Members are `docs/<doc_id>.txt` in the given
    * order behind the same dir + pax preamble as [[syntheticTar]];
    * outer wrapping rotates on the ARCHIVE id (gzip/plain/zstd/xz). */
  def syntheticTarMulti(archiveId: Long,
                        docs: Seq[(Long, String)]): WarcFile = {
    val pax = "29 mtime=1600000001.000000\n".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream(docs.map(_._2.length).sum + 4096)
    bos.write(headerBlock("docs/", 0L, '5'))
    bos.write(headerBlock("pax_header", pax.length.toLong, 'x')); bos.write(pad512(pax))
    docs.foreach { case (id, text) =>
      val body = text.getBytes("UTF-8")
      bos.write(headerBlock(s"docs/$id.txt", body.length.toLong, '0'))
      bos.write(pad512(body))
    }
    bos.write(new Array[Byte](1024))
    val raw = bos.toByteArray
    WarcFile(archiveId, (archiveId % 4) match {
      case 0 => WarcFixtures.gz(raw)
      case 1 | -1 => raw
      case 2 | -2 => zstd(raw)
      case _ => xz(raw)
    })
  }

  /** Construction twins of [[decompress]]'s zstd/xz legs (the same
    * Spark-bundled public libraries). */
  private[sources] def zstd(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.write(data); z.close()
    bos.toByteArray
  }

  private[sources] def xz(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    // preset 0 + minimal dictionary: the default preset-6 8 MiB LZMA2
    // dictionary costs ~10 ms and megabytes of churn PER DOCUMENT in
    // the construction half — the reader side is unaffected
    val opts = new org.tukaani.xz.LZMA2Options(0)
    opts.setDictSize(org.tukaani.xz.LZMA2Options.DICT_SIZE_MIN)
    val x = new org.tukaani.xz.XZOutputStream(bos, opts)
    x.write(data); x.close()
    bos.toByteArray
  }
}
