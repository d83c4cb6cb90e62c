package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Dataset

/** One WARC file as ingested bytes (the `binaryFile` reader's shape:
  * at 100 TB the payloads arrive via `spark.read.format("binaryFile")`
  * over a Common Crawl-style bucket, one row per ~1 GB .warc.gz). */
case class WarcFile(file_id: Long, payload: Array[Byte])

/** One parsed WARC record. `http_status`/`body_len`/`body_head` describe
  * the HTTP payload when the record carries one (response records),
  * otherwise the raw record payload; `http_status` is 0 for non-HTTP.
  * `charset` is the sniffed encoding `body_head` was decoded WITH
  * (BOM > HTTP Content-Type > meta charset > UTF-8-validity, falling
  * back to windows-1252 — see [[Warc.sniffCharset]]). `refers_to` is
  * the `WARC-Refers-To` header ("" when absent) — Common Crawl's
  * native dedup signal: a `revisit` record points at the record whose
  * payload it re-observed, so a pipeline folds revisits in as
  * PRE-CERTIFIED duplicates (l140) before computing any similarity of
  * its own. Strings default
  * to "" rather than null so the columns stay non-nullable
  * BIGINT/VARCHAR across engines. */
case class WarcRecord(file_id: Long, rec_idx: Long, warc_type: String,
                      target_uri: String, content_length: Long,
                      http_status: Long, body_len: Long, body_head: String,
                      charset: String, refers_to: String = "")

/**
 * WARC (ISO 28500) ingestion — the Common Crawl container every
 * web-scale training pipeline reads first. Mirrors the reference's
 * source-decode posture (SURVEY §2: sources decode at the edge,
 * malformed input is data, not error; cf. `Multimodal`'s container
 * walks): a header-level record walk that never materializes a record
 * body, plus gzip transparency for the standard `.warc.gz` layout
 * (per-record gzip members, which `GZIPInputStream` concatenates
 * natively).
 *
 * Scale contract:
 *  - STREAMING: the walk reads the (possibly gzip) stream forward once;
 *    bodies are skipped in chunks with only the first [[Warc.HeadBytes]]
 *    bytes retained, so memory per file is O(header), not O(payload).
 *  - BOMB-BOUNDED: decompressed bytes are capped ([[Warc.MaxBytes]]);
 *    a gzip bomb truncates the walk at the cap and yields the records
 *    parsed so far — a data-shaped outcome, never an executor OOM.
 *  - MALFORMED = PREFIX: a corrupt record (bad version line, missing
 *    Content-Length, body truncated mid-stream) ends the walk; every
 *    record before it is emitted. Fuzz-proven never to throw
 *    (WarcSpec, mutated/truncated/garbage payloads).
 */
object Warc {

  /** Bytes of body retained per record (provenance/debug head). */
  val HeadBytes = 48
  /** Decompression cap per file — the gzip-bomb guard. */
  val MaxBytes: Long = 1L << 30
  private val MaxLineBytes = 8192
  private val MaxHttpPrefix = 8192

  private object Malformed extends Exception { override def fillInStackTrace(): Throwable = this }

  /** Forward-only counted stream enforcing [[MaxBytes]]. */
  private final class BoundedIn(in: InputStream) {
    private var count = 0L
    def read(): Int = {
      val c = in.read()
      if (c >= 0) { count += 1; if (count > MaxBytes) throw Malformed }
      c
    }
    /** Read up to n bytes into buf (best effort); returns bytes read. */
    def readN(buf: Array[Byte], n: Int): Int = {
      var off = 0
      var c = 0
      while (off < n && c >= 0) {
        c = in.read(buf, off, n - off)
        if (c > 0) { off += c; count += c; if (count > MaxBytes) throw Malformed }
      }
      off
    }
    def skipN(n: Long): Long = {
      var left = n
      val buf = new Array[Byte](8192)
      var c = 0
      while (left > 0 && c >= 0) {
        c = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
        if (c > 0) { left -= c; count += c; if (count > MaxBytes) throw Malformed }
      }
      n - left
    }
  }

  /** One CRLF/LF-terminated line; None at clean EOF; Malformed past
    * [[MaxLineBytes]] (a header line that long is not a WARC header). */
  private def readLine(in: BoundedIn): Option[String] = {
    val buf = new ArrayBuffer[Byte]()
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      buf += c.toByte
      if (buf.length > MaxLineBytes) throw Malformed
      c = in.read()
    }
    val n = if (buf.nonEmpty && buf.last == '\r') buf.length - 1 else buf.length
    Some(new String(buf.take(n).toArray, "UTF-8"))
  }

  /** Pure single-file walk (unit-testable without Spark). */
  def parseFile(fileId: Long, payload: Array[Byte]): Seq[WarcRecord] =
    parseFile(fileId, payload, HeadBytes)

  /** `headBytes` sizes the retained body prefix: 48 for provenance
    * (the default), larger when downstream actually consumes the body —
    * e.g. the l68 crawl cascade extracts text from it, and the l135 WET
    * ingest keeps the whole conversion payload. The retained raw prefix
    * is `headBytes + MaxHttpPrefix` (the extra 8 KiB is the HTTP header
    * allowance, so an HTTP record still yields `headBytes` of BODY after
    * the header split) — memory per record is O(headBytes), chosen by
    * the caller, never O(payload). */
  def parseFile(fileId: Long, payload: Array[Byte], headBytes: Int): Seq[WarcRecord] = {
    val raw: InputStream = new ByteArrayInputStream(payload)
    def m(i: Int, v: Int) = payload.length > i && (payload(i) & 0xff) == v
    // outer-wrapping sniff: .warc.gz (per-record gzip members, which
    // GZIPInputStream concatenates), plus whole-file bzip2/zstd/xz via
    // the public commons-compress / zstd-jni / org.tukaani.xz libraries
    // Spark bundles — all STREAMING (the walk stays O(headBytes)
    // memory), all IOException failures degrading to prefix semantics
    // like a bad record
    val in0: InputStream =
      try {
        if (m(0, 0x1f) && m(1, 0x8b))
          new GZIPInputStream(new BufferedInputStream(raw))
        else if (m(0, 'B') && m(1, 'Z') && m(2, 'h'))
          new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorInputStream(new BufferedInputStream(raw), true)
        else if (m(0, 0x28) && m(1, 0xb5) && m(2, 0x2f) && m(3, 0xfd))
          new com.github.luben.zstd.ZstdInputStream(new BufferedInputStream(raw))
        else if (m(0, 0xfd) && m(1, '7') && m(2, 'z') && m(3, 'X') && m(4, 'Z') && m(5, 0))
          new org.tukaani.xz.XZInputStream(new BufferedInputStream(raw), 1 << 20)
        else raw
      } catch { case _: java.io.IOException => return Seq.empty }
    val in = new BoundedIn(in0)
    val out = ArrayBuffer.empty[WarcRecord]
    try {
      var idx = 0L
      var done = false
      while (!done) {
        // tolerate blank inter-record lines (the \r\n\r\n record suffix)
        var line = readLine(in)
        while (line.contains("")) line = readLine(in)
        line match {
          case None => done = true // clean EOF
          case Some(v) if !v.startsWith("WARC/") => throw Malformed
          case Some(_) =>
            // named header fields, case-insensitive, until the blank line
            var warcType = ""; var uri = ""; var cl = -1L; var refersTo = ""
            var h = readLine(in).getOrElse(throw Malformed)
            while (h.nonEmpty) {
              val i = h.indexOf(':')
              if (i > 0) {
                val k = h.substring(0, i).trim.toLowerCase
                val v = h.substring(i + 1).trim
                k match {
                  case "warc-type" => warcType = v
                  case "warc-target-uri" => uri = v
                  case "warc-refers-to" => refersTo = v
                  case "content-length" =>
                    cl = try v.toLong catch { case _: NumberFormatException => throw Malformed }
                  case _ => ()
                }
              }
              h = readLine(in).getOrElse(throw Malformed)
            }
            if (cl < 0) throw Malformed
            // record payload: retain a bounded prefix, skip the rest
            val prefixLen = math.min(cl, headBytes.toLong + MaxHttpPrefix.toLong).toInt
            val prefix = new Array[Byte](prefixLen)
            if (in.readN(prefix, prefixLen) < prefixLen) throw Malformed
            if (in.skipN(cl - prefixLen) < cl - prefixLen) throw Malformed
            out += httpSplit(fileId, idx, warcType, uri, cl, prefix, headBytes)
              .copy(refers_to = refersTo)
            idx += 1
        }
      }
    } catch {
      // prefix semantics: keep what parsed. IOException covers corrupt
      // or truncated gzip streams (ZipException/EOFException) — a bad
      // member ends the walk the same way a bad record does.
      case Malformed => ()
      case _: java.io.IOException => ()
    }
    out.toSeq
  }

  // -------------------------------------------------- charset sniffing

  /** Encoding sniff for an HTTP(ish) body, WHATWG priority order:
    * byte-order mark, then a `charset=` label in the HTTP Content-Type
    * header, then a `<meta charset=…>` / `http-equiv` label in the body
    * prefix, then content: bytes that validate as UTF-8 are UTF-8 and
    * anything else falls back to windows-1252 (the WHATWG default —
    * a superset of ISO-8859-1 in the bytes legacy pages actually use).
    * Unrecognized labels are IGNORED (fall through to the content
    * check) rather than trusted: a wrong decode silently corrupts
    * every downstream text operator, the exact failure this step
    * exists to stop. Deterministic, allocation-light, per record. */
  private[sources] def sniffCharset(httpHeaders: String, body: Array[Byte]): String = {
    def b(i: Int) = body(i) & 0xff
    if (body.length >= 3 && b(0) == 0xEF && b(1) == 0xBB && b(2) == 0xBF) "utf-8"
    else if (body.length >= 2 && b(0) == 0xFF && b(1) == 0xFE) "utf-16le"
    else if (body.length >= 2 && b(0) == 0xFE && b(1) == 0xFF) "utf-16be"
    else {
      // body-side labels come ONLY from a <meta …charset=…> tag inside
      // the WHATWG 1024-byte prescan window — a page that merely
      // MENTIONS "charset=iso-8859-1" in prose, script or a comment
      // must not outrank its own UTF-8 validity (it used to: that
      // mojibake'd valid UTF-8 pages, the exact corruption this sniff
      // exists to stop)
      val prescan = new String(body, 0, math.min(body.length, 1024),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val label = charsetLabel(httpHeaders)
        .orElse(metaCharsetLabel(prescan))
        .flatMap(canonicalCharset)
      label.getOrElse(if (isValidUtf8(body)) "utf-8" else "windows-1252")
    }
  }

  private val CharsetLabelRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)")

  /** `<meta charset=…>` / `<meta http-equiv=… content="…; charset=…">`:
    * the label must sit INSIDE a meta tag (before its `>`), per the
    * WHATWG meta prescan. */
  private val MetaCharsetRe =
    java.util.regex.Pattern.compile(
      "(?i)<meta[^>]*charset\\s*=\\s*[\"']?([A-Za-z0-9_.:-]+)")

  private def charsetLabel(s: String): Option[String] = {
    val m = CharsetLabelRe.matcher(s)
    if (m.find()) Some(m.group(1).toLowerCase(java.util.Locale.ROOT)) else None
  }

  private def metaCharsetLabel(s: String): Option[String] = {
    val m = MetaCharsetRe.matcher(s)
    if (m.find()) Some(m.group(1).toLowerCase(java.util.Locale.ROOT)) else None
  }

  /** WHATWG-ish label canonicalization for the encodings this walk
    * decodes; None = unknown label, fall through to content sniff. */
  private def canonicalCharset(l: String): Option[String] = l match {
    case "utf-8" | "utf8" | "us-ascii" | "ascii" => Some("utf-8")
    case "iso-8859-1" | "iso8859-1" | "latin-1" | "latin1" |
         "windows-1252" | "cp1252" | "x-cp1252" => Some("windows-1252")
    case "utf-16" | "utf-16le" | "unicode" => Some("utf-16le")
    case "utf-16be" => Some("utf-16be")
    case _ => None
  }

  /** Structural UTF-8 validation per the WHATWG/Unicode table: lead
    * bytes constrain the FIRST continuation byte (E0: A0–BF, ED: 80–9F,
    * F0: 90–BF, F4: 80–8F), which rejects overlong forms (E0 80 80),
    * UTF-16 surrogates (ED A0 80) and code points above U+10FFFF
    * (F4 90 80 80) — byte salads that would otherwise classify as
    * utf-8 and decode to U+FFFD instead of taking the windows-1252
    * fallback. A multibyte sequence cut by the PREFIX boundary counts
    * as VALID — the sniff sees a bounded prefix of long documents, and
    * a consistent-until-the-cut stream is UTF-8 evidence, not noise. */
  private[sources] def isValidUtf8(body: Array[Byte]): Boolean = {
    var i = 0
    while (i < body.length) {
      val c = body(i) & 0xff
      var n = 0; var lo1 = 0x80; var hi1 = 0xBF
      if (c < 0x80) n = 0
      else if (c >= 0xC2 && c <= 0xDF) n = 1
      else if (c == 0xE0) { n = 2; lo1 = 0xA0 }
      else if (c >= 0xE1 && c <= 0xEC) n = 2
      else if (c == 0xED) { n = 2; hi1 = 0x9F }
      else if (c >= 0xEE && c <= 0xEF) n = 2
      else if (c == 0xF0) { n = 3; lo1 = 0x90 }
      else if (c >= 0xF1 && c <= 0xF3) n = 3
      else if (c == 0xF4) { n = 3; hi1 = 0x8F }
      else return false
      var j = 1
      while (j <= n) {
        if (i + j >= body.length) return true // cut mid-sequence by the prefix
        val cc = body(i + j) & 0xff
        val lo = if (j == 1) lo1 else 0x80
        val hi = if (j == 1) hi1 else 0xBF
        if (cc < lo || cc > hi) return false
        j += 1
      }
      i += n + 1
    }
    true
  }

  /** Decode `bytes` under the sniffed charset, stripping a BOM and (for
    * UTF-16) a trailing odd byte left by the prefix cut. */
  private[sources] def decodeBody(bytes: Array[Byte], charset: String): String = {
    import java.nio.charset.StandardCharsets._
    charset match {
      case "utf-16le" | "utf-16be" =>
        val hasBom = bytes.length >= 2 &&
          (((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xFE) ||
            ((bytes(0) & 0xff) == 0xFE && (bytes(1) & 0xff) == 0xFF))
        val from = if (hasBom) 2 else 0
        val len = (bytes.length - from) & ~1
        new String(bytes, from, len, if (charset == "utf-16le") UTF_16LE else UTF_16BE)
      case "windows-1252" =>
        new String(bytes, java.nio.charset.Charset.forName("windows-1252"))
      case _ =>
        val from = if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xEF &&
          (bytes(1) & 0xff) == 0xBB && (bytes(2) & 0xff) == 0xBF) 3 else 0
        new String(bytes, from, bytes.length - from, UTF_8)
    }
  }

  /** Split an HTTP message payload into (status, body) when the record
    * carries one; non-HTTP payloads pass through whole. A header block
    * longer than [[MaxHttpPrefix]] is treated as non-HTTP (bounded-read
    * contract) — at that size it is not a sane HTTP header block. The
    * retained body head decodes under the SNIFFED charset (BOM / HTTP
    * header / meta label / UTF-8-validity → windows-1252). */
  private def httpSplit(fileId: Long, idx: Long, warcType: String, uri: String,
                        cl: Long, prefix: Array[Byte],
                        headBytes: Int): WarcRecord = {
    def ascii(b: Array[Byte], from: Int, until: Int) =
      new String(b, from, until - from, "UTF-8")
    val isHttp = prefix.length >= 5 && ascii(prefix, 0, 5) == "HTTP/"
    // locate \r\n\r\n inside the retained prefix
    var sep = -1
    if (isHttp) {
      var i = 0
      while (sep < 0 && i + 3 < prefix.length) {
        if (prefix(i) == '\r' && prefix(i + 1) == '\n' &&
            prefix(i + 2) == '\r' && prefix(i + 3) == '\n') sep = i
        i += 1
      }
    }
    if (!isHttp || sep < 0) {
      // sniff over the WHOLE retained prefix (a meta label may sit past
      // the head cut); decode only the head slice
      val cs = sniffCharset("", prefix)
      val head = java.util.Arrays.copyOfRange(prefix, 0, math.min(headBytes, prefix.length))
      WarcRecord(fileId, idx, warcType, uri, cl, 0L, cl, decodeBody(head, cs), cs)
    } else {
      val statusLineEnd = prefix.indexOf('\n'.toByte)
      val statusLine = ascii(prefix, 0, if (statusLineEnd < 0) prefix.length else statusLineEnd)
      val status = statusLine.split(" ").lift(1)
        .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)
      val bodyStart = sep + 4
      val fullBody = java.util.Arrays.copyOfRange(prefix, bodyStart, prefix.length)
      val cs = sniffCharset(ascii(prefix, 0, sep), fullBody)
      val head = java.util.Arrays.copyOfRange(fullBody, 0,
        math.min(headBytes, fullBody.length))
      WarcRecord(fileId, idx, warcType, uri, cl, status, cl - bodyStart,
        decodeBody(head, cs), cs)
    }
  }

  /** Construction half of the l130 mixed-container round trip (the
    * [[graft.operators.PdfText.syntheticPdf]] discipline for WARC): one
    * single-record WARC file wrapping an HTTP-200 HTML response, the
    * whole file gzipped on even ids so half the corpus exercises the
    * gzip-member path. The record/HTTP framing is the same
    * construction [[WarcFixtures]] certifies against l50/l77 oracles. */
  def syntheticResponse(fileId: Long, uri: String, html: String): WarcFile = {
    val rec = WarcFixtures.record("response", Some(uri),
      WarcFixtures.http("200 OK", html))
    WarcFile(fileId, if (fileId % 2 == 0) WarcFixtures.gz(rec) else rec)
  }

  /** WET construction half (l135): Common Crawl's `*.warc.wet`
    * extracted-text sidecar is a WARC whose `conversion` records carry
    * the page's plain text as the record payload (no HTTP framing) —
    * the zero-extraction entry point most corpus builds actually start
    * from. One warcinfo header + one conversion record per file, outer
    * wrapping rotated by id % 5 (gzip / plain / zstd / xz / bzip2 —
    * the same five shapes the tar walk certifies). */
  def syntheticWetFile(fileId: Long, uri: String, text: String): WarcFile = {
    val rec =
      WarcFixtures.record("warcinfo", None,
        "software: graft-wet".getBytes("UTF-8")) ++
        WarcFixtures.record("conversion", Some(uri), text.getBytes("UTF-8"))
    WarcFile(fileId, math.floorMod(fileId, 5L) match {
      case 0L => WarcFixtures.gz(rec)
      case 1L => rec
      case 2L => Tar.zstd(rec)
      case 3L => Tar.xz(rec)
      case _ => Tar.bz2(rec)
    })
  }

  /** l140 construction half: the WET corpus carrying Common Crawl's
    * native dedup signal — for `fileId % 4 == 0` the file holds, after
    * its conversion record, a REVISIT record (empty payload,
    * `WARC-Profile` identical-payload-digest, `WARC-Refers-To` pointing
    * at the conversion it re-observed) from a different mirror URL.
    * The fixture writes the referred record's Target-URI inside the
    * angle brackets as the pointer value (real crawls write the
    * record's `urn:uuid`; the fold joins on whatever identifier scheme
    * the writer used — string equality either way). */
  def syntheticWetRevisit(fileId: Long, uri: String, text: String): WarcFile = {
    val base =
      WarcFixtures.record("warcinfo", None,
        "software: graft-wet".getBytes("UTF-8")) ++
        WarcFixtures.record("conversion", Some(uri), text.getBytes("UTF-8"))
    val rec =
      if (fileId % 4 == 0)
        base ++ WarcFixtures.record("revisit",
          Some(s"http://mirror.example/re/$fileId"), Array.emptyByteArray,
          Seq(s"WARC-Refers-To: <$uri>",
            "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"))
      else base
    WarcFile(fileId, if (fileId % 2 == 0) WarcFixtures.gz(rec) else rec)
  }

  /** The distributed form: one narrow flatMap, no shuffle — record
    * extraction is embarrassingly parallel over files, and downstream
    * ops see a relational table of records, never bytes. */
  def records(files: Dataset[WarcFile]): Dataset[WarcRecord] =
    records(files, HeadBytes)

  def records(files: Dataset[WarcFile], headBytes: Int): Dataset[WarcRecord] = {
    import files.sparkSession.implicits._
    files.flatMap(f => parseFile(f.file_id, f.payload, headBytes))
  }
}
