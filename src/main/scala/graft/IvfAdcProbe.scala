package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for [[graft.operators.Similarity.ivfadcTopK]] (l85): the
 * claim that distinguishes IVFADC from the flat PQ scan (l79) is that
 * the ADC pass touches only the probed cells' codes — scanned-code
 * volume ∝ nprobe/ncells — while flat PQ scans the whole encoded
 * corpus per query batch. The probe measures BOTH: the exact count of
 * code rows surviving the cell prune (the ADC scan's input) and the
 * end-to-end query time, at nprobe ∈ {1, 2, 4, 8} over ncells = 8.
 *
 * Usage: `sbt "runMain graft.IvfAdcProbe [rows] [dim]"` (default
 * 50000 × 64; m = 8, ksub = 16, 5 queries, k = 10, rerank = 50).
 */
object IvfAdcProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(50000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val m = 8; val ksub = 16; val dsub = dim / m; val ncells = 8
    // integer-valued corpus clustered around the formula centroids so
    // cells are populated unevenly-but-fully (the realistic regime)
    val corpus = spark.range(rows.toLong).toDF("vec_id")
      .withColumn("v", expr(
        s"transform(sequence(0, ${dim - 1}), " +
          s"t -> CAST(((vec_id % $ncells) * 13 + t * 7) % 23 * 100000 " +
          s"+ (vec_id * 31 + t * 17) % 9973 AS DOUBLE))"))
    val cents = spark.range(ncells.toLong).toDF("cell")
      .withColumn("v", expr(
        s"transform(sequence(0, ${dim - 1}), " +
          "t -> CAST((cell * 13 + t * 7) % 23 * 100000 + 5000 AS DOUBLE))"))
    val books = spark.range(m.toLong * ksub).toDF("__i")
      .select((col("__i") / ksub).cast("int").as("s"),
        (col("__i") % ksub).cast("int").as("j"))
      .withColumn("sv", expr(s"transform(sequence(0, ${dsub - 1}), " +
        "t -> CAST(((j * 17 + t * 5 + s * 3) % 41 - 20) * 250 AS DOUBLE))"))
    // queries from ONE cluster so the scanned fraction shows the
    // per-query proportionality (queries spread over all cells would
    // union their probes and mask it)
    val queries = corpus.filter(col("vec_id") % ncells === 0 && col("vec_id") < 5L * ncells)

    val codes = Similarity.ivfadcEncode(corpus, cents, books,
      "v", "vec_id", "cell", m, dim).localCheckpoint()
    val total = codes.count()
    println(s"[ivfadc-probe] rows=$rows dim=$dim ncells=$ncells encoded=$total")

    Seq(1, 2, 4, 8).foreach { nprobe =>
      // the scan input after the cell prune: codes rows in probed cells
      val probedCells = Similarity.probeCells(queries, cents, "v", "vec_id",
          "cell", nprobe).select("cell").distinct()
      val scanned = codes.join(broadcast(probedCells), Seq("cell"), "left_semi").count()
      val t0 = System.nanoTime()
      Similarity.ivfadcTopK(queries, corpus, cents, books, "v", "vec_id",
          "cell", m, dim, k = 10, nprobe = nprobe, rerank = 50)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ivfadc-probe] nprobe=$nprobe scanned=$scanned " +
        f"(${scanned * 100.0 / total}%.1f%% of corpus) end-to-end $dt%.2f s")
    }
    spark.stop()
  }
}
