package graft

import org.apache.spark.sql.SparkSession

/**
 * Scale probe for the BPE surface (graft.operators.Bpe): times
 * trainMerges (driver endgame vs all-distributed) and the two encoders
 * (chained-projection reference vs broadcast-rank mapPartitions) at a
 * given SF dir, so SCALE.md can record the 10× behavior by running at
 * sf0.01 and sf0.1.
 *
 * The driver-shipped documents table has a ~31-word vocabulary — far
 * too small to exercise an encoder — so the probe also takes
 * `synth:<n>`: a deterministic n-word vocabulary (ids rendered in a
 * 6-letter alphabet, 8-16 symbols long, Zipf-ish counts), which is the
 * regime a real tokenizer run sees (|vocab| ~ 10⁵-10⁶ after the
 * corpus-sized wordCounts agg).
 *
 * Usage: `sbt "runMain graft.BpeProbe /root/testdata/sf0.01 [nMerges]"`
 *     or `sbt "runMain graft.BpeProbe synth:50000 [nMerges]"`.
 */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.functions._
    val docs =
      if (dir.startsWith("synth:")) {
        val n = dir.drop(6).toInt
        // word = id in base 6 over a-f, repeated to 8-16 symbols;
        // repetition count ~ n/(id+1) gives the Zipf head real corpora
        // have (head words repeat, so one text row per (word, rep))
        spark.range(n).select(
          explode(expr("sequence(0, CAST(least(9, id DIV 100 + 1) AS INT))")).as("r"),
          expr("repeat(translate(conv(id, 10, 6), '012345', 'abcdef'), " +
            "CAST(2 + id % 3 AS INT))").as("text"))
          .select(col("text"))
      } else graft.sources.Tables.documents(spark, dir)
    val vocabRows = graft.operators.Bpe.wordCounts(docs, "text").count()

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    println(s"[probe] dir=$dir vocab=$vocabRows nMerges=$nMerges")
    val mLocal = timed(s"trainMerges driver endgame")(
      graft.operators.Bpe.trainMerges(docs, "text", nMerges))
    // the distributed path is one Spark job per merge — probe it at a
    // tenth of the budget and scale the comparison linearly
    val distN = math.max(1, nMerges / 10)
    timed(s"trainMerges distributed ($distN)")(
      graft.operators.Bpe.trainMerges(docs, "text", distN, driverVocabLimit = 0L))
    val merges = mLocal.map(m => (m._1, m._2))
    println(s"[probe] trained ${merges.size} merges")
    timed(s"encodeWordsFast (${merges.size})")(
      graft.operators.Bpe.encodeWordsFast(docs, "text", merges)
        .foreach(_ => ()))
    // the chain's cost is merges.length projections — cap it so the
    // probe terminates, and scale the comparison
    val chainN = math.min(merges.size, 25)
    timed(s"encodeWords chain ($chainN)")(
      graft.operators.Bpe.encodeWords(docs, "text", merges.take(chainN))
        .foreach(_ => ()))
    spark.stop()
  }
}
