package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Z-order layout: per-file ranges must shrink on EVERY clustered
  * dimension (that is the data-skipping claim), and the write must be
  * lossless. */
class ClusteredWriterSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def perFileSpread(dir: String, c: String): Double = {
    val df = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max(col(c).cast("double")) - min(col(c).cast("double"))).as("spread"))
    df.agg(avg("spread")).as[Double].head()
  }

  test("writeClustered shrinks per-file min/max ranges on both dimensions") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val base = Files.createTempDirectory("zorder").toString
    val flat = s"$base/flat"; val zed = s"$base/z"

    // unclustered baseline: same file count, hash-random row placement.
    // 16 files = 4 z-prefix bits = both dimensions quartered (the top
    // z bits alternate dims), so each dimension's expected per-file
    // spread is ~25% of the hash layout's.
    events.repartition(16).write.parquet(flat)
    ClusteredWriter.writeClustered(events, Seq("user_id", "value"), zed, 16)

    // lossless
    val a = events.orderBy("event_id").collect().toSeq
    val b = spark.read.parquet(zed).orderBy("event_id").collect().toSeq
    assert(a == b)

    // both dimensions skip: clustered per-file spread well under the
    // hash layout's (which is ~ the full range in every file). Expected
    // ~25% each; assert a conservative 40% reduction to stay robust to
    // range-sampling boundary noise.
    val uSpreadFlat = perFileSpread(flat, "user_id")
    val uSpreadZ = perFileSpread(zed, "user_id")
    val vSpreadFlat = perFileSpread(flat, "value")
    val vSpreadZ = perFileSpread(zed, "value")
    assert(uSpreadZ < 0.6 * uSpreadFlat,
      s"user_id spread $uSpreadZ !< 0.6 * $uSpreadFlat")
    assert(vSpreadZ < 0.6 * vSpreadFlat,
      s"value spread $vSpreadZ !< 0.6 * $vSpreadFlat")
  }

  test("zInterleave is the textbook bit interleave") {
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(ClusteredWriter.zInterleave(Seq(col("x"), col("y")), 4).as("z"))
      .as[Long].head()
    // x=0011, y=0101 → bits (y3 x3 y2 x2 y1 x1 y0 x0) = 0 0 1 0 0 1 1 1
    assert(out == java.lang.Long.parseLong("00100111", 2))
  }

  test("bloomCols write real parquet bloom filters (footer-verified)") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value")
    val dir = Files.createTempDirectory("zbloom").toString + "/t"
    ClusteredWriter.writeClustered(events, Seq("user_id", "value"), dir, 2,
      bloomCols = Seq("event_id"))

    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.nonEmpty)
    for (f <- files) {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
      try {
        val cols = reader.getFooter.getBlocks.get(0).getColumns
        import scala.jdk.CollectionConverters._
        val byName = cols.asScala.map(c => c.getPath.toDotString -> c).toMap
        // bloomed column carries a filter; the others must not
        assert(reader.readBloomFilter(byName("event_id")) != null,
          s"no bloom filter for event_id in $f")
        assert(reader.readBloomFilter(byName("user_id")) == null,
          s"unexpected bloom filter for user_id in $f")
      } finally reader.close()
    }
  }

  test("zInterleave matches a reference interleave on random inputs") {
    def reference(vals: Seq[Long], bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits; j <- vals.indices)
        if (((vals(j) >> i) & 1L) == 1L) z |= 1L << (i * vals.size + j)
      z
    }
    val rnd = new scala.util.Random(42)
    for (dims <- Seq(1, 2, 3)) {
      val bits = 63 / dims
      val rows = Seq.fill(200)(Seq.fill(dims)(rnd.nextLong() & ((1L << bits) - 1)))
      val df = rows.map(r => (r.lift(0).getOrElse(0L), r.lift(1).getOrElse(0L),
        r.lift(2).getOrElse(0L))).toDF("a", "b", "c")
      val cols = Seq(col("a"), col("b"), col("c")).take(dims)
      val got = df.select(ClusteredWriter.zInterleave(cols, bits).as("z"))
        .as[Long].collect().toSeq
      val want = rows.map(reference(_, bits))
      assert(got == want, s"dims=$dims")
    }
  }

  test("rangeBucket clamps, orders monotonically, and sends nulls to 0") {
    val df = Seq[java.lang.Double](-5.0, 0.0, 2.5, 10.0, 99.0, null)
      .toDF("v")
    val out = df.select(ClusteredWriter.rangeBucket(col("v"), 0.0, 10.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(out(0) == 0L)   // below lo → clamp 0
    assert(out(1) == 0L)
    assert(out(2) == 3L)   // 2.5/10 * 15 = 3.75 → floor 3
    assert(out(3) == 15L)  // hi → top bucket
    assert(out(4) == 15L)  // above hi → clamp top
    assert(out(5) == 0L)   // null → origin
  }

  test("single-dimension clustering degenerates to a plain range sort") {
    val df = (0L until 1000L).map(i => (i, (i * 37) % 1000)).toDF("id", "k")
    val dir = Files.createTempDirectory("zorder1").toString
    ClusteredWriter.writeClustered(df, Seq("k"), dir, 4)
    // each file's k-range must be ~disjoint quarters, spread ≈ 250 not 1000
    assert(perFileSpread(dir, "k") < 300.0)
  }
}
