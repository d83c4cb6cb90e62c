package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.MediaFile

/** The standard security handler (ISO 32000 §7.6.3), empty-user-
  * password path: every supported handler layout round-trips, a REAL
  * user password keeps the empty-text contract, tampered dictionaries
  * fail closed, and an encrypted PDF 1.5+ ObjStm layout decrypts
  * before expansion. */
class PdfCryptSpec extends AnyFunSuite {

  private val sample = "Owner-locked text: (parens) \\ backéslash 世界!"
  private def wrapEscape(text: String): String = {
    val wrapped = new String(text.getBytes("UTF-8"), "ISO-8859-1")
    wrapped.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    }
  }
  private def unwrap(extracted: String): String =
    new String(extracted.getBytes("ISO-8859-1"), "UTF-8")

  test("all five handler layouts round-trip, flated and raw") {
    for (handler <- 0 to 4; flate <- Seq(true, false)) {
      val body = PdfFixtures.encryptedPdf("1.6",
        s"BT (${wrapEscape(sample)}) Tj ET", flate, handler, docId = 7L)
      val doc = PdfText.decodePdfText(MediaFile(7L, body))
      assert(unwrap(doc.text) == sample,
        s"handler=$handler flate=$flate: got '${doc.text}'")
      // the l112 gate still reports the document as encrypted
      assert(Multimodal.parsePdfMeta(MediaFile(7L, body)).exists(_.encrypted))
    }
  }

  test("a NON-empty user password keeps the empty-text contract") {
    for (handler <- 0 to 4) {
      val body = PdfFixtures.encryptedPdf("1.6",
        s"BT (${wrapEscape(sample)}) Tj ET", flate = false, handler,
        docId = 9L, userPw = "secret".getBytes("UTF-8"))
      val doc = PdfText.decodePdfText(MediaFile(9L, body))
      assert(doc.text == "", s"handler=$handler leaked: '${doc.text}'")
    }
  }

  test("tampered /U or /O fails authentication closed (no garbage)") {
    val body = new String(PdfFixtures.encryptedPdf("1.6",
      s"BT (${wrapEscape(sample)}) Tj ET", flate = false, handler = 1,
      docId = 3L), "ISO-8859-1")
    for (key <- Seq("/U <", "/O <")) {
      val at = body.indexOf(key) + key.length
      val flipped = body.substring(0, at) +
        (if (body.charAt(at) == '0') '1' else '0') + body.substring(at + 1)
      val doc = PdfText.decodePdfText(
        MediaFile(3L, flipped.getBytes("ISO-8859-1")))
      assert(doc.text == "", s"tampered $key extracted '${doc.text}'")
    }
  }

  test("malformed V5 dicts and non-Standard filters decline (no garbage)") {
    val base = new String(PdfFixtures.encryptedPdf("1.6",
      "BT (hello) Tj ET", flate = false, handler = 1, docId = 5L), "ISO-8859-1")
    // claims V5 but carries an R3-shaped dict (32-byte /U, no /UE):
    // structurally unusable for AES-256 → decline, never garbage
    val v5 = base.replace("/V 2 /R 3", "/V 5 /R 6")
    assert(PdfText.decodePdfText(MediaFile(5L, v5.getBytes("ISO-8859-1"))).text == "")
    val custom = base.replace("/Filter /Standard", "/Filter /MyCustomSec")
    assert(PdfText.decodePdfText(MediaFile(5L, custom.getBytes("ISO-8859-1"))).text == "")
  }

  test("V5/R6: tampered /U validation hash or /UE fails closed") {
    val body = new String(PdfFixtures.encryptedPdf("2.0",
      s"BT (${wrapEscape(sample)}) Tj ET", flate = true, handler = 4,
      docId = 21L), "ISO-8859-1")
    assert(unwrap(PdfText.decodePdfText(
      MediaFile(21L, body.getBytes("ISO-8859-1"))).text) == sample)
    for (key <- Seq("/U <", "/UE <")) {
      val at = body.indexOf(key) + key.length
      val flipped = body.substring(0, at) +
        (if (body.charAt(at) == '0') '1' else '0') + body.substring(at + 1)
      val doc = PdfText.decodePdfText(MediaFile(21L, flipped.getBytes("ISO-8859-1")))
      assert(doc.text == "", s"tampered $key extracted '${doc.text.take(40)}'")
    }
  }

  test("encrypted ObjStm layout: object streams decrypt BEFORE expansion") {
    // hand-built PDF 1.6: catalog/pages/page dicts inside a deflated-
    // then-RC4-encrypted /Type /ObjStm; content stream encrypted too;
    // the /Type /XRef dict (plaintext by spec, NEVER encrypted)
    // carries /Root, /Encrypt, and /ID — no `trailer` keyword
    val r = 3; val keyBytes = 16
    def md5(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5").digest(b)
    val id0 = md5("objstm-id".getBytes("UTF-8"))
    val o = PdfCrypt.computeO("owner".getBytes("UTF-8"), Array.emptyByteArray, r, keyBytes)
    val p = -3904
    val key = PdfCrypt.fileKey(Array.emptyByteArray, o, p, id0, r, keyBytes,
      encryptMetadata = true)
    val u = PdfCrypt.computeU(key, id0, r) ++ new Array[Byte](16)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02X").mkString
    val embedded = Seq(
      2 -> "<< /Type /Catalog /Pages 3 0 R >>",
      3 -> "<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
      4 -> "<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>")
    val header = new StringBuilder; val objBody = new StringBuilder
    embedded.foreach { case (num, src) =>
      header.append(s"$num ${objBody.length} "); objBody.append(src).append('\n')
    }
    val first = header.length
    val packedPlain = PdfFixtures.deflateStr(header.toString + objBody.toString)
    val packed = new String(PdfCrypt.encryptData(key, 1L, 0,
      packedPlain.getBytes("ISO-8859-1"), aes = false), "ISO-8859-1")
    val content = new String(PdfCrypt.encryptData(key, 5L, 0,
      "BT (inside objstm) Tj ET".getBytes("ISO-8859-1"), aes = false), "ISO-8859-1")
    val encDict = s"<< /Filter /Standard /V 2 /R 3 /Length 128 " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $p >>"
    val xrefData = "  " * 8
    val body = ("%PDF-1.6\n" +
      s"1 0 obj\n<< /Type /ObjStm /N 3 /First $first /Length ${packed.length} " +
      s"/Filter /FlateDecode >>\nstream\n$packed\nendstream\nendobj\n" +
      s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      s"6 0 obj\n$encDict\nendobj\n" +
      s"7 0 obj\n<< /Type /XRef /Size 8 /W [1 1 1] /Root 2 0 R /Encrypt 6 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] /Length ${xrefData.length} >>\n" +
      s"stream\n$xrefData\nendstream\nendobj\n" +
      "startxref\n9\n%%EOF\n").getBytes("ISO-8859-1")
    val doc = PdfText.decodePdfText(MediaFile(11L, body))
    assert(doc.text == "inside objstm", s"got '${doc.text}'")
    assert(Multimodal.parsePdfMeta(MediaFile(11L, body)).exists(_.encrypted))
  }

  test("Algorithm 2.B matches a spec-literal independent reimplementation") {
    // Written 1-based straight from ISO 32000-2 §7.6.4.3.4's prose
    // ("repeat until the last byte of E is <= the number of rounds
    // performed - 32"), sharing NOTHING with hash2B — this pins the
    // termination boundary an off-by-one would shift (fixture round
    // trips cannot: writer and reader share hash2B).
    def ref2B(password: Array[Byte], salt: Array[Byte],
              udata: Array[Byte]): Array[Byte] = {
      var k = java.security.MessageDigest.getInstance("SHA-256")
        .digest(password ++ salt ++ udata)
      var rounds = 0
      var done = false
      while (!done) {
        rounds += 1
        val block = password ++ k ++ udata
        val k1 = Array.fill(64)(block).flatten
        val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
          new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
        val e = cipher.doFinal(k1)
        val mod = e.take(16).map(_ & 0xFF).sum % 3
        k = java.security.MessageDigest.getInstance(
          Seq("SHA-256", "SHA-384", "SHA-512")(mod)).digest(e)
        if (rounds >= 64 && (e.last & 0xFF) <= rounds - 32) done = true
      }
      k.take(32)
    }
    val rnd = new scala.util.Random(182L)
    (0 until 200).foreach { i =>
      val salt = Array.fill(8)(rnd.nextInt(256).toByte)
      val udata = if (i % 3 == 0) Array.fill(48)(rnd.nextInt(256).toByte)
                  else Array.emptyByteArray
      assert(java.util.Arrays.equals(
        PdfCrypt.hash2B(Array.emptyByteArray, salt, udata, 6),
        ref2B(Array.emptyByteArray, salt, udata)), s"iter $i")
    }
    // R5 (no iteration) stays the plain SHA-256
    val salt5 = Array.fill(8)(7.toByte)
    assert(java.util.Arrays.equals(
      PdfCrypt.hash2B(Array.emptyByteArray, salt5, Array.emptyByteArray, 5),
      java.security.MessageDigest.getInstance("SHA-256").digest(salt5)))
  }

  test("V5: absent /StmF means streams are NOT encrypted (Identity default)") {
    val body = new String(PdfFixtures.encryptedPdf("2.0", "BT (plain v5) Tj ET",
      flate = false, handler = 4, docId = 33L), "ISO-8859-1")
    val noStmF = body.replace("/StmF /StdCF /StrF /StdCF ", "")
    assert(noStmF != body, "fixture dict shape changed — update the test")
    val hook = PdfCrypt.decryptor(noStmF)
    assert(hook.isDefined) // empty-user-password authentication still passes
    val raw = "arbitrary plaintext stream "
    assert(hook.get(5L, 0, "<< /Length 28 >>", raw) == raw) // untouched
  }

  test("fuzz: bit-flipped encrypted payloads degrade, never throw") {
    val rnd = new scala.util.Random(136L)
    for (handler <- 0 to 4) {
      val base = PdfFixtures.encryptedPdf("1.6",
        s"BT (${wrapEscape(sample)}) Tj ET", flate = true, handler, docId = 13L)
      (0 until 60).foreach { _ =>
        val mutated = base.clone()
        val at = rnd.nextInt(mutated.length)
        mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
        PdfText.decodePdfText(MediaFile(13L, mutated)) // must not throw
      }
    }
  }
}
