package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import Multimodal.{MediaFile, PdfMeta}

/**
 * Deterministic PDF payloads for the l112 oracle — the l48/l61 fixture
 * discipline, PDF twin: each payload is built byte-exactly from known
 * construction parameters (version, page count, encryption, truncation)
 * and the DuckDB oracle is a VALUES relation of those SAME parameters,
 * so a match proves [[Multimodal.parsePdfMeta]]'s header/page-tree/
 * trailer walk reads back exactly what the construction wrote —
 * independent of the parser under test.
 */
object PdfFixtures {

  /** A minimal structurally-valid PDF: header, catalog, a page tree
    * with `count` kids, per-page objects, trailer (optionally carrying
    * an /Encrypt entry), %%EOF. Object offsets in the xref are fake —
    * the parser walks structure, not the xref — but every token a
    * structural reader needs is in place and correctly ordered. */
  private def pdf(version: String, count: Int, encrypted: Boolean): Array[Byte] = {
    val kids = (0 until count).map(k => s"${3 + k} 0 R").mkString("[", " ", "]")
    val pages = (0 until count).map { k =>
      s"${3 + k} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>\nendobj\n"
    }.mkString
    val enc = if (encrypted) s"\n${3 + count} 0 obj\n<< /Filter /Standard /V 2 >>\nendobj\n" else ""
    val encRef = if (encrypted) s" /Encrypt ${3 + count} 0 R" else ""
    val body =
      s"%PDF-$version\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        s"2 0 obj\n<< /Type /Pages /Kids $kids /Count $count >>\nendobj\n" +
        pages + enc +
        "xref\n0 1\n0000000000 65535 f \n" +
        s"trailer\n<< /Size ${4 + count} /Root 1 0 R$encRef >>\n" +
        "startxref\n0\n%%EOF\n"
    body.getBytes("ISO-8859-1")
  }

  /** Header present, everything after the first object missing — the
    * truncated-download shape (no page tree, no %%EOF). */
  private def truncated(version: String): Array[Byte] =
    s"%PDF-$version\n1 0 obj\n<< /Type /Catalog".getBytes("ISO-8859-1")

  private def textPayload: Array[Byte] =
    "these bytes are prose, not a pdf document".getBytes("UTF-8")

  /** The stub contract restated from its construction arithmetic. */
  private def stubExpected(id: Long, bl: Long): PdfMeta =
    PdfMeta(id, bl, "", 1L + bl % 9L, encrypted = false,
      has_eof = false, container = "stub")

  /** (payload, expected metadata) — expectations from construction
    * parameters, never from the parser under test. */
  lazy val fixtures: Seq[(MediaFile, PdfMeta)] = {
    val single = pdf("1.4", 1, encrypted = false)
    val multi = pdf("1.7", 5, encrypted = false)
    val enc = pdf("2.0", 2, encrypted = true)
    val trunc = truncated("1.5")
    val text = textPayload
    // the PDF 1.5+ compressed layout: page tree inside a /Type /ObjStm,
    // xref as a stream, no trailer keyword — n_pages comes from the
    // EXPANDED embedded page-tree dict
    val objstm = objStmPdf("1.6",
      Seq("BT (m1) Tj ET", "BT (m2) Tj ET", "BT (m3) Tj ET"), flate = true)
    Seq(
      (MediaFile(1L, single),
        PdfMeta(1L, single.length.toLong, "1.4", 1L, encrypted = false,
          has_eof = true, container = "pdf")),
      (MediaFile(2L, multi),
        PdfMeta(2L, multi.length.toLong, "1.7", 5L, encrypted = false,
          has_eof = true, container = "pdf")),
      (MediaFile(3L, enc),
        PdfMeta(3L, enc.length.toLong, "2.0", 2L, encrypted = true,
          has_eof = true, container = "pdf")),
      (MediaFile(4L, trunc),
        PdfMeta(4L, trunc.length.toLong, "1.5", 0L, encrypted = false,
          has_eof = false, container = "pdf")),
      (MediaFile(5L, text), stubExpected(5L, text.length.toLong)),
      (MediaFile(6L, objstm),
        PdfMeta(6L, objstm.length.toLong, "1.6", 3L, encrypted = false,
          has_eof = true, container = "pdf")))
  }

  /** The l112 input frame. */
  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(fixtures.map(_._1))
  }

  /** The l112 DuckDB oracle: a VALUES relation of the construction-side
    * expectations. */
  def oracleSql: String = {
    val rows = fixtures.map { case (_, m) =>
      s"(CAST(${m.doc_id} AS BIGINT), CAST(${m.byte_len} AS BIGINT), " +
        s"'${m.version}', CAST(${m.n_pages} AS BIGINT), " +
        s"${m.encrypted.toString.toUpperCase}, ${m.has_eof.toString.toUpperCase}, " +
        s"'${m.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, byte_len, version, n_pages, encrypted, has_eof, container) " +
      "ORDER BY doc_id"
  }

  // ----------------------------------------------------- text fixtures

  /** A content-stream object: direct /Length (always byte-exact, so the
    * parser's length-bounded path is the one exercised), optionally
    * Flate-compressed with `java.util.zip.Deflater` — the construction
    * twin of the `Inflater` decode under test. ISO-8859-1 keeps the
    * compressed bytes 1:1 through the string assembly. */
  private def contentObj(num: Int, source: String, flate: Boolean): String = {
    val data =
      if (flate) {
        val in = source.getBytes("ISO-8859-1")
        val d = new java.util.zip.Deflater()
        d.setInput(in); d.finish()
        val buf = new Array[Byte](in.length * 2 + 64)
        val m = d.deflate(buf); d.end()
        new String(buf, 0, m, "ISO-8859-1")
      } else source
    val filter = if (flate) " /Filter /FlateDecode" else ""
    s"$num 0 obj\n<< /Length ${data.length}$filter >>\nstream\n$data\nendstream\nendobj\n"
  }

  /** A structurally-complete PDF whose pages CARRY content streams:
    * catalog(1), page tree(2), then per page k a page object (3+2k)
    * referencing its content object (4+2k). `reverseKids` lists the
    * Kids array in reverse object order, so a correct extractor must
    * follow TREE order, not object order. */
  private[operators] def textPdf(version: String, pageSources: Seq[String], flate: Boolean,
                                 encrypted: Boolean, reverseKids: Boolean): Array[Byte] = {
    val n = pageSources.length
    val kidNums = (0 until n).map(k => 3 + 2 * k)
    val kids = (if (reverseKids) kidNums.reverse else kidNums)
      .map(k => s"$k 0 R").mkString("[", " ", "]")
    val pages = (0 until n).map { k =>
      s"${3 + 2 * k} 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${4 + 2 * k} 0 R >>\nendobj\n" +
        contentObj(4 + 2 * k, pageSources(k), flate)
    }.mkString
    val encObjNum = 3 + 2 * n
    val enc =
      if (encrypted) s"$encObjNum 0 obj\n<< /Filter /Standard /V 2 >>\nendobj\n" else ""
    val encRef = if (encrypted) s" /Encrypt $encObjNum 0 R" else ""
    (s"%PDF-$version\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      s"2 0 obj\n<< /Type /Pages /Kids $kids /Count $n >>\nendobj\n" +
      pages + enc +
      "xref\n0 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size ${4 + 2 * n} /Root 1 0 R$encRef >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")
  }

  /** Construction-side stream encoders — the filter TWINS of the
    * decode chain under test (deflate from `java.util.zip`, hex and
    * base-85 armor per ISO 32000 §7.4.2–3), so an l133 round trip
    * certifies the decoders against independent constructions. */
  private[operators] def deflateStr(src: String): String = {
    val in = src.getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val buf = new Array[Byte](in.length * 2 + 64)
    val m = d.deflate(buf); d.end()
    new String(buf, 0, m, "ISO-8859-1")
  }

  private[operators] def hexEncode(src: String): String =
    src.map(c => f"${c.toInt & 0xFF}%02X").mkString + ">"

  private[operators] def a85Encode(src: String): String = {
    val out = new StringBuilder(src.length * 5 / 4 + 4)
    var i = 0
    while (i + 4 <= src.length) {
      val v = ((src.charAt(i) & 0xFFL) << 24) | ((src.charAt(i + 1) & 0xFFL) << 16) |
        ((src.charAt(i + 2) & 0xFFL) << 8) | (src.charAt(i + 3) & 0xFFL)
      if (v == 0L) out.append('z')
      else {
        var d = 85L * 85 * 85 * 85
        var r = v
        while (d >= 1) { out.append(('!' + (r / d)).toChar); r %= d; d /= 85 }
      }
      i += 4
    }
    val rem = src.length - i
    if (rem > 0) { // pad with zero bytes, emit rem+1 chars
      var v = 0L
      (0 until 4).foreach { k =>
        v = (v << 8) | (if (i + k < src.length) src.charAt(i + k) & 0xFFL else 0L)
      }
      val five = new Array[Char](5)
      var d = 85L * 85 * 85 * 85
      var r = v
      (0 until 5).foreach { k => five(k) = ('!' + (r / d)).toChar; r %= d; d /= 85 }
      out.appendAll(five, 0, rem + 1)
    }
    out.append("~>").toString
  }

  /** RunLength armor (§7.4.5 construction twin): runs of ≥ 3 identical
    * bytes as 257−n repeats, everything else as ≤128-byte literal
    * chunks, EOD 128. */
  private[operators] def rleEncode(src: String): String = {
    val out = new StringBuilder(src.length + 8)
    var i = 0
    while (i < src.length) {
      var run = 1
      while (i + run < src.length && run < 128 && src.charAt(i + run) == src.charAt(i))
        run += 1
      if (run >= 3) {
        out.append((257 - run).toChar).append(src.charAt(i))
        i += run
      } else {
        // literal chunk: extend until a >=3 repeat starts or 128 bytes;
        // the final min caps the count byte at 127 (128 is EOD, and an
        // overshoot from the 2-byte lookahead must spill to the next
        // chunk, never collide with the marker)
        var lit = i + run
        var ended = false
        while (!ended && lit < src.length && lit - i < 128) {
          var next = 1
          while (lit + next < src.length && next < 3 && src.charAt(lit + next) == src.charAt(lit))
            next += 1
          if (next >= 3) ended = true else lit += next
        }
        val n = math.min(lit - i, 128)
        out.append((n - 1).toChar).appendAll(src.toCharArray, i, n)
        i += n
      }
    }
    out.append(128.toChar).toString
  }

  /** The l136 construction half: a one-page PDF whose content stream
    * is filtered (optional Flate) THEN encrypted — the §7.6.2 write
    * order — with keys the construction derives from ITS OWN chosen
    * owner password, permissions, and file ID through the public-spec
    * algorithms ([[PdfCrypt]] Alg 2/3/4/5), exactly the dictionary an
    * owner-locked print-driver PDF carries: real /O (computed from the
    * owner password, Alg 3), real /U (the empty-user-password
    * signature, Alg 4/5), signed /P, trailer /ID. The USER password is
    * EMPTY, so a conforming reader opens it without prompting.
    * `handler` picks the layout: 0 = R2/V1 RC4-40, 1 = R3/V2 RC4-128,
    * 2 = R4/V4 crypt-filter RC4, 3 = R4/V4 AESV2 (AES-128-CBC, IV
    * prepended, PKCS#5 padding), 4 = R6/V5 AESV3 (AES-256: /U carries
    * hash ‖ validation-salt ‖ key-salt, the 256-bit file key wraps
    * into /UE under the Algorithm-2.B-derived intermediate key, /O//OE
    * computed from the owner password with /U as udata). A round trip
    * certifies the Encrypt-
    * dict parse, the key derivation, the /U authentication, and the
    * decrypt-before-filters ordering on every document. */
  private[operators] def encryptedPdf(version: String, source: String,
                                      flate: Boolean, handler: Int,
                                      docId: Long,
                                      userPw: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    def md5(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5").digest(b)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02X").mkString
    val ownerPw = s"owner-$docId".getBytes("UTF-8")
    val p = -3904
    if (handler == 4) {
      // V5/R6: deterministic construction salts + file key; the reader
      // must re-derive everything from the dictionary alone
      val fileKey = md5(s"fk-$docId".getBytes("UTF-8")) ++
        md5(s"fk2-$docId".getBytes("UTF-8"))
      val vs = md5(s"vs-$docId".getBytes("UTF-8")).take(8)
      val ks = md5(s"ks-$docId".getBytes("UTF-8")).take(8)
      val u = PdfCrypt.hash2B(userPw, vs, Array.emptyByteArray, 6) ++ vs ++ ks
      val ue = PdfCrypt.wrapFileKeyV5(userPw, ks, fileKey, 6)
      val ovs = md5(s"ovs-$docId".getBytes("UTF-8")).take(8)
      val oks = md5(s"oks-$docId".getBytes("UTF-8")).take(8)
      val o = PdfCrypt.hash2B(ownerPw, ovs, u, 6) ++ ovs ++ oks
      val oe = PdfCrypt.wrapOwnerKeyV5(ownerPw, oks, u, fileKey)
      val filtered = if (flate) deflateStr(source) else source
      val iv = md5(s"iv-$docId".getBytes("UTF-8")).take(16)
      val data = new String(
        PdfCrypt.encryptDataV5(fileKey, filtered.getBytes("ISO-8859-1"), iv),
        "ISO-8859-1")
      val filter = if (flate) " /Filter /FlateDecode" else ""
      val encDict = "<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
        s"/StmF /StdCF /StrF /StdCF /O <${hex(o)}> /U <${hex(u)}> " +
        s"/OE <${hex(oe)}> /UE <${hex(ue)}> /P $p /EncryptMetadata true >>"
      return (s"%PDF-$version\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${data.length}$filter >>\nstream\n$data\nendstream\nendobj\n" +
        s"5 0 obj\n$encDict\nendobj\n" +
        "xref\n0 1\n0000000000 65535 f \n" +
        "trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R >>\n" +
        "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")
    }
    val (r, v, bits, aes) = handler match {
      case 0 => (2, 1, 40, false)
      case 1 => (3, 2, 128, false)
      case 2 => (4, 4, 128, false)
      case _ => (4, 4, 128, true)
    }
    val keyBytes = bits / 8
    val id0 = md5(s"graft-id-$docId".getBytes("UTF-8"))
    val o = PdfCrypt.computeO(ownerPw, userPw, r, keyBytes)
    // p = -3904: print allowed; modify/copy/annotate denied — the common lock
    val key = PdfCrypt.fileKey(userPw, o, p, id0, r, keyBytes,
      encryptMetadata = true)
    val uSig = PdfCrypt.computeU(key, id0, r)
    // R ≥ 3 writers pad /U to 32 with arbitrary bytes (spec compares 16)
    val u = if (r == 2) uSig else uSig ++ new Array[Byte](16)
    val filtered = if (flate) deflateStr(source) else source
    val iv = md5(s"iv-$docId".getBytes("UTF-8")).take(16)
    val enc = PdfCrypt.encryptData(key, 4L, 0,
      filtered.getBytes("ISO-8859-1"), aes, if (aes) iv else null)
    val data = new String(enc, "ISO-8859-1")
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val encDict = handler match {
      case 0 => s"<< /Filter /Standard /V 1 /R 2 /O <${hex(o)}> /U <${hex(u)}> /P $p >>"
      case 1 => s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
        s"/O <${hex(o)}> /U <${hex(u)}> /P $p >>"
      case h =>
        val cfm = if (h == 2) "V2" else "AESV2"
        s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
          s"/CF << /StdCF << /CFM /$cfm /AuthEvent /DocOpen /Length $keyBytes >> >> " +
          s"/StmF /StdCF /StrF /StdCF /O <${hex(o)}> /U <${hex(u)}> /P $p >>"
    }
    (s"%PDF-$version\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${data.length}$filter >>\nstream\n$data\nendstream\nendobj\n" +
      s"5 0 obj\n$encDict\nendobj\n" +
      "xref\n0 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")
  }

  /** A one-page PDF whose content stream carries an arbitrary
    * `/Filter` entry over pre-encoded data — the l133 chain shapes. */
  private[operators] def filteredPdf(version: String, data: String,
                                     filterSpec: String): Array[Byte] =
    (s"%PDF-$version\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${data.length} $filterSpec >>\nstream\n$data\nendstream\nendobj\n" +
      "xref\n0 1\n0000000000 65535 f \n" +
      "trailer\n<< /Size 5 /Root 1 0 R >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")

  /** A one-page PDF whose page carries an INLINE `/Resources /Font`
    * dict naming a `/Type0` font (object 5) with an embedded
    * `/ToUnicode` CMap stream (object 6) — the subset-embedded
    * CID-font shape (ISO 32000 §9.10.3). The content stream selects
    * the font with `Tf` and shows hex-string CODES; a correct
    * extractor must resolve name → font → CMap and decode codes to
    * Unicode, not emit the raw code bytes. `flate` compresses BOTH
    * the content and the CMap stream. */
  private[operators] def cmapPdf(version: String, contentSrc: String,
                                 cmapSrc: String, flate: Boolean): Array[Byte] =
    (s"%PDF-$version\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n" +
      contentObj(4, contentSrc, flate) +
      "5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synth " +
      "/ToUnicode 6 0 R >>\nendobj\n" +
      contentObj(6, cmapSrc, flate) +
      "xref\n0 1\n0000000000 65535 f \n" +
      "trailer\n<< /Size 7 /Root 1 0 R >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")

  /** The l138 shape: a one-page PDF whose page font is a SIMPLE font
    * (Type1, no /ToUnicode) with an `/Encoding` dictionary carrying a
    * `/Differences` array — the remapped/symbolic-font layout. The
    * encoding dict is inline in the font (`indirectEnc = false`) or an
    * indirect `/Type /Encoding` object (true): both real-writer
    * shapes. Content shows the pre-encoded literal `data` through
    * `/F1`. */
  /** [[differencesPdf]]'s NAMED-BASE-ENCODING twin (l146): the
    * `/Encoding` VALUE passes through verbatim — a bare name
    * (`/WinAnsiEncoding`) or a dict carrying `/BaseEncoding` plus a
    * partial `/Differences` — inline in the font dict or as an
    * indirect object (both real-writer shapes). */
  private[operators] def baseEncPdf(version: String, data: String,
                                    encValue: String, flate: Boolean,
                                    indirectEnc: Boolean): Array[Byte] = {
    val fontObj =
      if (indirectEnc)
        "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding 6 0 R >>\nendobj\n" +
          s"6 0 obj\n$encValue\nendobj\n"
      else
        "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/Encoding $encValue >>\nendobj\n"
    (s"%PDF-$version\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n" +
      contentObj(4, data, flate) +
      fontObj +
      "xref\n0 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size ${if (indirectEnc) 7 else 6} /Root 1 0 R >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")
  }

  private[operators] def differencesPdf(version: String, data: String,
                                        differences: String, flate: Boolean,
                                        indirectEnc: Boolean): Array[Byte] = {
    val encDict = s"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
      s"/Differences [$differences] >>"
    val fontObj =
      if (indirectEnc)
        "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          "/Encoding 6 0 R >>\nendobj\n" +
          s"6 0 obj\n$encDict\nendobj\n"
      else
        "5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
          s"/Encoding $encDict >>\nendobj\n"
    (s"%PDF-$version\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n" +
      contentObj(4, data, flate) +
      fontObj +
      "xref\n0 1\n0000000000 65535 f \n" +
      s"trailer\n<< /Size ${if (indirectEnc) 7 else 6} /Root 1 0 R >>\n" +
      "startxref\n0\n%%EOF\n").getBytes("ISO-8859-1")
  }

  /** The PDF 1.5+ COMPRESSED layout (ISO 32000 §7.5.7–8): catalog,
    * page tree, and page dicts all live inside ONE Flate-compressed
    * `/Type /ObjStm` object stream (object 1) — `/N` `objnum offset`
    * header pairs, objects at `/First`-relative offsets; content
    * streams stay regular objects (the spec forbids streams inside an
    * ObjStm); the cross-reference is a `/Type /XRef` STREAM whose
    * plaintext dict carries `/Root` — NO `trailer` keyword anywhere,
    * the modern shape most post-2007 writers emit. `truncateObjStm`
    * halves the deflate payload (keeping its advertised /Length) for
    * the degrade-never-throw fuzz check. */
  private[operators] def objStmPdf(version: String, pageSources: Seq[String],
                                   flate: Boolean,
                                   truncateObjStm: Boolean = false): Array[Byte] = {
    val n = pageSources.length
    // embedded: catalog=2, pages=3, page k = 4+k; content k = 4+n+k (regular)
    val kids = (0 until n).map(k => s"${4 + k} 0 R").mkString("[", " ", "]")
    val embedded: Seq[(Int, String)] =
      Seq(2 -> "<< /Type /Catalog /Pages 3 0 R >>",
        3 -> s"<< /Type /Pages /Kids $kids /Count $n >>") ++
        (0 until n).map(k => (4 + k) ->
          (s"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] " +
            s"/Contents ${4 + n + k} 0 R >>"))
    val header = new StringBuilder
    val body = new StringBuilder
    embedded.foreach { case (num, src) =>
      header.append(s"$num ${body.length} ")
      body.append(src).append('\n')
    }
    val first = header.length
    val in = (header.toString + body.toString).getBytes("ISO-8859-1")
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val buf = new Array[Byte](in.length * 2 + 64)
    val m = d.deflate(buf); d.end()
    val full = new String(buf, 0, m, "ISO-8859-1")
    val packed = if (truncateObjStm) full.substring(0, full.length / 2) else full
    val objStm =
      s"1 0 obj\n<< /Type /ObjStm /N ${embedded.length} /First $first " +
        s"/Length ${packed.length} /Filter /FlateDecode >>\n" +
        s"stream\n$packed\nendstream\nendobj\n"
    val contents = (0 until n).map(k =>
      contentObj(4 + n + k, pageSources(k), flate)).mkString
    val xrefNum = 4 + 2 * n
    // fake W [1 1 1] rows — locations come from the keyword walk, the
    // xref stream is here for its PLAINTEXT dict (/Root), per the spec
    val xrefData = "\u0001\u0000\u0000" * (xrefNum + 1)
    val xref =
      s"$xrefNum 0 obj\n<< /Type /XRef /Size ${xrefNum + 1} /W [1 1 1] " +
        s"/Root 2 0 R /Length ${xrefData.length} >>\n" +
        s"stream\n$xrefData\nendstream\nendobj\n"
    (s"%PDF-$version\n" + objStm + contents + xref +
      "startxref\n9\n%%EOF\n").getBytes("ISO-8859-1")
  }

  /** (payload, expected extraction) for l113 — expectations hand-folded
    * from the SAME operator sources written into each content stream
    * (the extraction contract in [[PdfText]]'s doc), never from the
    * parser under test. */
  lazy val textFixtures: Seq[(MediaFile, PdfText.Doc)] = {
    // 1: the operator tour — Td before any glyph adds nothing; Tj
    // concatenates; TD / T* break lines; TJ concatenates only the
    // string elements of its array (kerning numbers ignored)
    val t1 = textPdf("1.4", Seq(
      "BT /F1 12 Tf 72 712 Td (Hello, ) Tj (world) Tj " +
        "0 -14 TD (second line) Tj T* [(kerned) -120 ( array)] TJ ET"),
      flate = false, encrypted = false, reverseKids = false)
    val t1text = "Hello, world\nsecond line\nkerned array"
    // 2: two FlateDecode pages, Kids REVERSED — reading order is the
    // tree's, so BRAVO (object 5) precedes ALPHA (object 3)
    val t2 = textPdf("1.7", Seq(
      "BT 72 712 Td (PAGE ALPHA) Tj ET",
      "BT 72 712 Td (PAGE BRAVO) Tj ET"),
      flate = true, encrypted = false, reverseKids = true)
    val t2text = "PAGE BRAVO\nPAGE ALPHA"
    // 3: string syntax — paren/backslash escapes, 1–3 digit octal
    // (\101='A', \60='0'), hex pairs, and ' = newline-then-show
    val t3 = textPdf("1.5", Seq(
      "BT (A\\(B\\)C\\\\D ) Tj (oct:\\101\\60!) Tj <486921> Tj (tab\\there)' ET"),
      flate = false, encrypted = false, reverseKids = false)
    val t3text = "A(B)C\\D oct:A0!Hi!\ntab\there"
    // 4: encrypted — streams are ciphertext, the contract reports ""
    val t4 = textPdf("2.0", Seq("BT (SECRET) Tj ET"),
      flate = false, encrypted = true, reverseKids = false)
    // 5: not a PDF — stub arithmetic; 6: truncated header-only
    val t5 = textPayload
    val t6 = truncated("1.5")
    // 7: PDF 1.5+ compressed layout — page tree inside a Flate ObjStm,
    // xref stream with plaintext /Root dict, no trailer keyword; the
    // page-2 TD before its first glyph adds nothing (page join already
    // ended with \n)
    val t7 = objStmPdf("1.5", Seq(
      "BT (COMPRESSED ALPHA) Tj ET",
      "BT 0 -14 TD (COMPRESSED BRAVO) Tj ET"), flate = true)
    val t7text = "COMPRESSED ALPHA\nCOMPRESSED BRAVO"
    Seq(
      (MediaFile(1L, t1), PdfText.Doc(1L, 1L, t1text, t1text.length.toLong, "pdf")),
      (MediaFile(2L, t2), PdfText.Doc(2L, 2L, t2text, t2text.length.toLong, "pdf")),
      (MediaFile(3L, t3), PdfText.Doc(3L, 1L, t3text, t3text.length.toLong, "pdf")),
      (MediaFile(4L, t4), PdfText.Doc(4L, 1L, "", 0L, "pdf")),
      (MediaFile(5L, t5), PdfText.Doc(5L, 1L + t5.length % 9L, "", 0L, "stub")),
      (MediaFile(6L, t6), PdfText.Doc(6L, 0L, "", 0L, "pdf")),
      (MediaFile(7L, t7), PdfText.Doc(7L, 2L, t7text, t7text.length.toLong, "pdf")))
  }

  /** The l113 input frame. */
  def textDataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(textFixtures.map(_._1))
  }

  /** DuckDB literal for text that may carry control characters:
    * plain segments in standard-quoted strings (no backslash escapes —
    * backslash stays literal), control characters via chr(n). Shared
    * with [[OfficeFixtures]]' text oracle. */
  private[operators] def sqlLit(s: String): String = {
    val parts = scala.collection.mutable.Buffer[String]()
    val cur = new StringBuilder
    def flush(): Unit = { parts += ("'" + cur.toString.replace("'", "''") + "'"); cur.clear() }
    s.foreach { ch =>
      if (ch < ' ') { flush(); parts += s"chr(${ch.toInt})" } else cur.append(ch)
    }
    flush()
    parts.mkString(" || ")
  }

  /** The l113 DuckDB oracle: the construction-side expected text. */
  def textOracleSql: String = {
    val rows = textFixtures.map { case (_, d) =>
      s"(CAST(${d.doc_id} AS BIGINT), CAST(${d.n_pages} AS BIGINT), " +
        s"${sqlLit(d.text)}, CAST(${d.n_chars} AS BIGINT), '${d.container}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS " +
      "t(doc_id, n_pages, text, n_chars, container) ORDER BY doc_id"
  }
}
