package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scale probe for [[graft.operators.Pca.covarianceStats]] at realistic
 * embedding width: the pair explode is dim·(dim+1)/2 structs per row
 * (dim 256 → 32,896 — l74's fixture dim 64 is only 2,080), so the
 * claims to verify are (a) cost scales LINEARLY in rows at fixed dim
 * (the explode factor is per-row constant; the (i,j) agg keyspace is
 * dim²/2, row-count independent) and (b) the deterministic sample
 * front-end ([[graft.operators.Pca.covarianceStatsSampled]]) buys the
 * expected cost reduction on a big corpus.
 *
 * Usage: `sbt "runMain graft.PcaProbe [rows] [dim]"` (default
 * 1000 × 256; runs 1×, 10×, and 10×-sampled-at-0.1, two reps each).
 */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(1000)
    val dim = args.lift(1).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(n: Int) = spark.range(n.toLong).toDF("id")
      .withColumn("v", expr(
        s"transform(sequence(0, ${dim - 1}), " +
          "j -> CAST((id * 31 + j * 17) % 1000 AS DOUBLE) / 1000.0)"))

    val variants = Seq(
      "1x" -> (() => graft.operators.Pca.covarianceStats(corpus(rows), "v")),
      "10x" -> (() => graft.operators.Pca.covarianceStats(corpus(rows * 10), "v")),
      "10x-sample0.1" -> (() => graft.operators.Pca.covarianceStatsSampled(
        corpus(rows * 10), "v", "id", 0.1)))
    println(s"[pca-probe] rows=$rows dim=$dim pairsPerRow=${dim * (dim + 1) / 2}")
    variants.foreach { case (label, build) =>
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[pca-probe] $label rep $rep: $dt%.2f s")
      }
    }
    spark.stop()
  }
}
