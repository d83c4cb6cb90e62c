package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic BMP fixtures for the l78 dHash oracle, on the
 * l48/l50/l77 ground-truth pattern: each image is BUILT from a pixel
 * formula simple enough that the expected 64-bit dHash is derived BY
 * HAND from the pattern (written below as literals/hand-formulas, never
 * by running the operator), and the DuckDB oracle is a VALUES relation
 * of those expectations. 24-bit BMP is lossless, so decode returns the
 * constructed pixels exactly; gray pixels (R=G=B=v) have luma exactly
 * v under the documented integer luma.
 *
 * Derivations:
 *  - inc-ramp 9×8, v(x,y) = 10 + 20x: every right cell is brighter →
 *    all 64 bits set → hash = -1.
 *  - dec-ramp, v = 170 − 20x: no right cell brighter → 0.
 *  - vert-ramp, v = 10 + 20y: columns equal within a row → 0 (a true
 *    dHash collision with dec-ramp — row-wise gradients are what dHash
 *    sees; it is blind to vertical structure by design).
 *  - inc-ramp 18×16, v = 10 + 10x: cell (r,c) averages x ∈ {2c, 2c+1}
 *    → 15 + 20c, increasing → -1 (certifies the area-average path
 *    reproduces the 9×8 hash).
 *  - one-dark-cell: inc-ramp with pixel (4, 3) set to 0 → only cell
 *    (3,4) changes; bit(3,3) (was 1: 70<90... now 0>70 false) clears,
 *    bit(3,4) (90>0) stays set → hash = -1 with bit 27 cleared →
 *    Hamming 1 from inc-ramp.
 *  - text bytes: not an image → decoded = false, hash 0.
 */
object ImageFixtures {

  import graft.operators.Multimodal.MediaFile

  private def bmp(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "bmp", bos), "JDK has no bmp writer")
    bos.toByteArray
  }

  /** (doc_id, payload, expected decoded, expected dhash). */
  lazy val cases: Seq[(Long, Array[Byte], Boolean, Long)] = Seq(
    (1L, bmp(9, 8)((x, _) => 10 + 20 * x), true, -1L),
    (2L, bmp(9, 8)((x, _) => 170 - 20 * x), true, 0L),
    (3L, bmp(9, 8)((_, y) => 10 + 20 * y), true, 0L),
    (4L, bmp(18, 16)((x, _) => 10 + 10 * x), true, -1L),
    (5L, bmp(9, 8)((x, y) => if (x == 4 && y == 3) 0 else 10 + 20 * x), true,
      -1L ^ (1L << 27)),
    (6L, "not an image at all".getBytes("UTF-8"), false, 0L))

  def dataset(spark: SparkSession): Dataset[MediaFile] = {
    import spark.implicits._
    spark.createDataset(cases.map(c => MediaFile(c._1, c._2)))
  }

  // ------------------------------------------------- synthetic writers
  //
  // HAND-WRITTEN containers for the l128 corpus round trip — the
  // construction side is independent of the javax.imageio READER under
  // test (the bmp() helper above writes through ImageIO; these write
  // the bytes themselves from the public specs, so a round trip
  // certifies the decode against a foreign writer).

  /** 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * bottom-up rows padded to 4 bytes) around gray pixels v(x, y). */
  private[operators] def syntheticBmp(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val out = new java.io.ByteArrayOutputStream(54 + dataSize)
    def w16(x: Int): Unit = { out.write(x & 0xFF); out.write((x >> 8) & 0xFF) }
    def w32(x: Int): Unit = { w16(x & 0xFFFF); w16((x >> 16) & 0xFFFF) }
    out.write('B'); out.write('M')
    w32(54 + dataSize); w32(0); w32(54) // file size, reserved, pixel offset
    w32(40); w32(w); w32(h) // info header: positive height = bottom-up
    w16(1); w16(24); w32(0); w32(dataSize) // planes, bpp, BI_RGB, data size
    w32(2835); w32(2835); w32(0); w32(0) // 72 dpi, no palette
    var y = h - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      var written = 0
      while (x < w) {
        val g = v(x, y) & 0xFF
        out.write(g); out.write(g); out.write(g) // BGR (gray: same byte)
        written += 3
        x += 1
      }
      while (written < rowBytes) { out.write(0); written += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** PNG with STORED (uncompressed) deflate blocks (RFC 2083): IHDR
    * (8-bit RGB), one IDAT carrying a raw zlib stream of type-00
    * blocks over filter-0 rows, IEND — every byte written by hand,
    * CRC32/Adler32 from java.util.zip. */
  private[operators] def syntheticPngStored(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val raw = new java.io.ByteArrayOutputStream((w * 3 + 1) * h)
    var y = 0
    while (y < h) {
      raw.write(0) // filter type 0 per row
      var x = 0
      while (x < w) {
        val g = v(x, y) & 0xFF
        raw.write(g); raw.write(g); raw.write(g)
        x += 1
      }
      y += 1
    }
    val rawB = raw.toByteArray
    val z = new java.io.ByteArrayOutputStream(rawB.length + 64)
    z.write(0x78); z.write(0x01) // zlib header, no preset dict
    var off = 0
    while (off < rawB.length) { // stored deflate blocks, <= 65535 each
      val n = math.min(65535, rawB.length - off)
      val fin = if (off + n >= rawB.length) 1 else 0
      z.write(fin) // BFINAL + BTYPE=00
      z.write(n & 0xFF); z.write((n >> 8) & 0xFF)
      z.write(~n & 0xFF); z.write((~n >> 8) & 0xFF)
      z.write(rawB, off, n)
      off += n
    }
    val adler = new java.util.zip.Adler32()
    adler.update(rawB)
    val a = adler.getValue
    z.write(((a >> 24) & 0xFF).toInt); z.write(((a >> 16) & 0xFF).toInt)
    z.write(((a >> 8) & 0xFF).toInt); z.write((a & 0xFF).toInt)
    val out = new java.io.ByteArrayOutputStream()
    def w32be(x: Long): Unit = {
      out.write(((x >> 24) & 0xFF).toInt); out.write(((x >> 16) & 0xFF).toInt)
      out.write(((x >> 8) & 0xFF).toInt); out.write((x & 0xFF).toInt)
    }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      w32be(data.length.toLong)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      w32be(crc.getValue)
    }
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1A, '\n'))
    val ihdr = new java.io.ByteArrayOutputStream(13)
    def ih32(x: Int): Unit = {
      ihdr.write((x >> 24) & 0xFF); ihdr.write((x >> 16) & 0xFF)
      ihdr.write((x >> 8) & 0xFF); ihdr.write(x & 0xFF)
    }
    ih32(w); ih32(h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** The l128 corpus constructor: per-document image whose EVERY
    * readout is an arithmetic function of doc_id alone — so the oracle
    * is pure SQL, the l48 ground-truth pattern:
    *   width = 9 + id%8, height = 8 + id%5 (w ≥ 9 keeps the dHash
    *   cell x-ranges disjoint), base a = 10 + id%50, step b = 1 + id%7
    *   (max luma 59 + 7·15 = 164 < 255 — no clamp, monotonicity holds),
    *   pattern by id%3: 0 = inc-ramp in x ⇒ every cell strictly
    *   brighter to the right ⇒ dhash −1; 1 = dec-ramp ⇒ 0; 2 =
    *   vertical ramp ⇒ rows constant ⇒ 0 (dHash is row-differential).
    * Even ids write hand-built BMP, odd ids hand-built stored-PNG, so
    * the round trip certifies BOTH decode paths against foreign
    * writers on half the corpus each. */
  private[graft] def syntheticImage(docId: Long): MediaFile = {
    val w = (9 + docId % 8).toInt
    val h = (8 + docId % 5).toInt
    val a = (10 + docId % 50).toInt
    val b = (1 + docId % 7).toInt
    val v: (Int, Int) => Int = (docId % 3) match {
      case 0 => (x, _) => a + b * x
      case 1 => (x, _) => a + b * (w - 1 - x)
      case _ => (_, y) => a + b * y
    }
    MediaFile(docId,
      if (docId % 2 == 0) syntheticBmp(w, h)(v) else syntheticPngStored(w, h)(v))
  }

  /** The l78 DuckDB oracle: VALUES of the hand-derived expectations. */
  def oracleSql: String = {
    val rows = cases.map { case (id, _, dec, hash) =>
      s"(CAST($id AS BIGINT), $dec, CAST($hash AS BIGINT))"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(doc_id, decoded, dhash) ORDER BY doc_id"
  }
}
