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

  /** The l78 DuckDB oracle: VALUES of the hand-derived expectations. */
  def oracleSql: String = {
    val rows = cases.map { case (id, _, dec, hash) =>
      s"(CAST($id AS BIGINT), $dec, CAST($hash AS BIGINT))"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(doc_id, decoded, dhash) ORDER BY doc_id"
  }
}
