package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Unigram language-model tokenizer (SentencePiece's default algorithm
 * — Kudo, "Subword Regularization: Improving Neural Network Translation
 * Models with Multiple Subword Candidates", ACL 2018, §3) — the OTHER
 * production tokenizer family next to [[Bpe]]: instead of a greedy
 * merge list, a VOCABULARY OF PIECES WITH PROBABILITIES trained by EM
 * over the segmentation lattice, decoded by Viterbi. North-star
 * extension: the reference (/root/reference/src/lib.rs:1-957) has no
 * text surface at all.
 *
 * Distributed shape (mirrors the [[Bpe]] trainer's):
 *  - the ONLY corpus-sized operation is [[Bpe.wordCounts]] — one
 *    map-side-combined agg to the distinct-word table, computed once
 *    and reused by every EM round (at 100 TB: billions of rows in,
 *    ~1e8 distinct words out);
 *  - each E-step is one narrow pass over the distinct words with the
 *    vocab BROADCAST (a few MB at the usual 32k–256k piece budgets),
 *    emitting per-piece expected-count contributions that hash-agg
 *    partial-combines map-side — the shuffle carries ≤ |vocab| rows
 *    per partition, never the corpus;
 *  - the M-step collect is |vocab| rows — the
 *    [[Similarity.trainCentroids]] codebook discipline (driver data
 *    bounded by the model size, never the corpus).
 *
 * Determinism is EXACT, not approximate: per-word expected counts are
 * computed in a fixed code path (forward–backward in log space), then
 * ROUNDED TO FIXED-POINT LONGS (×2^20) before the cross-partition sum,
 * which runs in DECIMAL(38,0) — integer addition is order-independent,
 * so the trained vocab is bit-identical at any partitioning/cpu count
 * (the house integer-sufficient-statistics discipline; Double sums
 * over a shuffle are not reproducible). [[trainUnigramLocal]] replays
 * the identical loop driver-side and is spec-pinned to produce the
 * identical vocab — the small-corpus endgame, and the parity proof
 * that the distributed path computes the textbook algorithm.
 */
object Unigram {

  /** Fixed-point scale for expected-count sufficient statistics. */
  private val Scale = 1L << 20

  /** All substring occurrences of `w` up to `maxLen` chars (seed
    * candidates; each occurrence counts, the SentencePiece convention). */
  private def substrings(w: String, maxLen: Int): Iterator[String] =
    for {
      i <- (0 until w.length).iterator
      l <- (1 to math.min(maxLen, w.length - i)).iterator
    } yield w.substring(i, i + l)

  /**
   * Seed vocabulary from the distinct-word table: every observed
   * single character (segmentation coverage must never fail), plus the
   * top `seedSize − |chars|` multi-char substrings by occurrence mass
   * `count × len` (frequent AND long seeds are the useful ones —
   * Kudo §3.2 seeds from top suffix-array substrings; occurrence mass
   * is the same ranking computed relationally). Returns
   * (piece, scaledSeedCount) with the mass as the initial
   * sufficient statistic. Deterministic: ties break on the piece
   * string ascending.
   */
  private[operators] def seedVocab(wc: Seq[(String, Long)], seedSize: Int,
                                   maxPieceLen: Int): Seq[(String, Long)] = {
    val mass = new scala.collection.mutable.HashMap[String, Long]
    wc.foreach { case (w, c) =>
      substrings(w, maxPieceLen).foreach { p =>
        mass.update(p, mass.getOrElse(p, 0L) + c)
      }
    }
    val (chars, multi) = mass.toSeq.partition(_._1.length == 1)
    val kept = multi
      .map { case (p, c) => (p, c * p.length) }
      .sortBy { case (p, m) => (-m, p) }
      .take(math.max(0, seedSize - chars.size))
    // seed statistic: occurrence mass ×len for multi-char, ×1 for chars
    (chars ++ kept).sortBy(_._1)
  }

  /**
   * Expected piece counts for one (word, count) under the current
   * vocab — forward–backward over the segmentation lattice in log
   * space, contributions rounded to ×[[Scale]] longs. The shared
   * kernel of the distributed E-step and the local reference loop:
   * identical rounding here is what makes the two bit-identical.
   */
  private[operators] def expectedScaled(w: String, cnt: Long,
      idx: collection.Map[String, Int], logp: Array[Double],
      maxPieceLen: Int): Iterator[(Int, Long)] = {
    val n = w.length
    val NegInf = Double.NegativeInfinity
    // log-sum-exp accumulate: acc ⊕ x
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a >= b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(maxPieceLen, i)
      while (l <= lmax) {
        if (alpha(i - l) != NegInf) idx.get(w.substring(i - l, i)) match {
          case Some(pi) => alpha(i) = lse(alpha(i), alpha(i - l) + logp(pi))
          case None =>
        }
        l += 1
      }
      i += 1
    }
    if (alpha(n) == NegInf) Iterator.empty // word not coverable (empty vocab)
    else {
      i = n - 1
      while (i >= 0) {
        var l = 1
        val lmax = math.min(maxPieceLen, n - i)
        while (l <= lmax) {
          if (beta(i + l) != NegInf) idx.get(w.substring(i, i + l)) match {
            case Some(pi) => beta(i) = lse(beta(i), logp(pi) + beta(i + l))
            case None =>
          }
          l += 1
        }
        i -= 1
      }
      val z = alpha(n)
      val out = new scala.collection.mutable.HashMap[Int, Long]
      i = 0
      while (i < n) {
        if (alpha(i) != NegInf) {
          var l = 1
          val lmax = math.min(maxPieceLen, n - i)
          while (l <= lmax) {
            if (beta(i + l) != NegInf) idx.get(w.substring(i, i + l)) match {
              case Some(pi) =>
                val e = math.exp(alpha(i) + logp(pi) + beta(i + l) - z)
                val sc = math.round(e * cnt * Scale)
                if (sc > 0L) out.update(pi, out.getOrElse(pi, 0L) + sc)
              case None =>
            }
            l += 1
          }
        }
        i += 1
      }
      out.iterator
    }
  }

  /** log-probs from exact scaled-count statistics: p_i = c_i / Σc.
    * BigInt → Double conversions are deterministic; single chars are
    * floored at 1 scaled count so coverage never dies. */
  private def logProbs(pieces: Array[String], scaled: Array[BigInt]): Array[Double] = {
    val floored = pieces.indices.map { i =>
      if (pieces(i).length == 1 && scaled(i) <= 0) BigInt(1) else scaled(i)
    }
    val total = floored.sum.max(BigInt(1))
    val t = total.toDouble
    floored.map(c => math.log(c.toDouble.max(0.5) / t)).toArray
  }

  /** One prune step: keep all single chars + the top multi-char pieces
    * by (scaled count desc, piece asc) so the vocab shrinks to
    * max(vocabSize, ⌊size·keepFrac⌋) — SentencePiece's iterative 75%
    * shrink, with exact-integer deterministic ordering. */
  private def prune(pieces: Array[String], scaled: Array[BigInt],
                    vocabSize: Int, keepFrac: Double): Array[String] = {
    val (chars, multi) = pieces.indices.partition(i => pieces(i).length == 1)
    val target = math.max(vocabSize, (pieces.length * keepFrac).toInt)
    val keepMulti = math.max(0, target - chars.size)
    val kept = multi
      .sortBy(i => (-scaled(i), pieces(i)))
      .take(keepMulti)
    (chars ++ kept).map(pieces).sortBy(identity).toArray
  }

  /**
   * Driver-side reference trainer over a collected (word, count)
   * table — the [[Bpe.trainMergesLocal]]-style endgame, and the exact
   * twin of [[trainUnigram]] (identical seed, EM kernel, rounding,
   * prune ordering → identical output, spec-pinned). Returns
   * (piece, prob) sorted (prob desc, piece asc).
   */
  def trainUnigramLocal(wc: Seq[(String, Long)], vocabSize: Int,
                        seedSize: Int, maxPieceLen: Int = 8,
                        emRounds: Int = 2, keepFrac: Double = 0.75): Seq[(String, Double)] = {
    val seed = seedVocab(wc, seedSize, maxPieceLen)
    var pieces = seed.map(_._1).toArray
    var scaled = seed.map(s => BigInt(s._2)).toArray
    def emRound(): Unit = {
      val idx = pieces.zipWithIndex.toMap
      val lp = logProbs(pieces, scaled)
      val acc = new scala.collection.mutable.HashMap[Int, BigInt]
      wc.foreach { case (w, c) =>
        expectedScaled(w, c, idx, lp, maxPieceLen).foreach { case (pi, sc) =>
          acc.update(pi, acc.getOrElse(pi, BigInt(0)) + sc)
        }
      }
      scaled = pieces.indices.map(i => acc.getOrElse(i, BigInt(0))).toArray
    }
    var continue = true
    while (continue) {
      (0 until emRounds).foreach(_ => emRound())
      if (pieces.length > vocabSize) {
        val keptP = prune(pieces, scaled, vocabSize, keepFrac)
        // prune floors at the alphabet (single chars are never cut, so
        // coverage can't die); a vocabSize below the alphabet size is a
        // fixed point — stop, don't spin (the alphabet IS the vocab)
        if (keptP.length == pieces.length) continue = false
        val byPiece = pieces.zip(scaled).toMap
        pieces = keptP
        scaled = keptP.map(byPiece)
      } else continue = false
    }
    emRound()
    finishVocab(pieces, scaled)
  }

  private def finishVocab(pieces: Array[String], scaled: Array[BigInt]): Seq[(String, Double)] = {
    val lp = logProbs(pieces, scaled)
    pieces.indices.map(i => (pieces(i), math.exp(lp(i))))
      .sortBy { case (p, pr) => (-pr, p) }
  }

  /**
   * Distributed trainer. The corpus collapses ONCE to the distinct
   * (word, count) table ([[Bpe.wordCounts]], persisted); each EM round
   * is a narrow broadcast pass + a DECIMAL(38,0) integer agg +
   * a |vocab|-row collect. Output is bit-identical to
   * [[trainUnigramLocal]] on the same corpus at any cpu count.
   *
   * Seed note: the seed substring mass is itself an agg over word
   * substrings — at 100 TB that table is |words|·maxPieceLen·avgLen
   * rows BEFORE its map-side combine, the same cost class as the BPE
   * trainer's pair-count rounds; it runs once.
   */
  def trainUnigram(docs: DataFrame, textCol: String, vocabSize: Int,
                   seedSize: Int, maxPieceLen: Int = 8,
                   emRounds: Int = 2, keepFrac: Double = 0.75,
                   minCount: Long = 1L): Seq[(String, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = Bpe.wordCounts(docs, textCol, minCount)
      .select(col("w"), col("c").cast("long"))
      .as[(String, Long)]
      .persist()
    try {
      // ---- seed (distributed): substring occurrence mass. The
      // candidate table never reaches the driver: chars collect as the
      // alphabet (bounded), multi-char candidates as a distributed
      // top-k (TakeOrdered on the total (mass desc, piece asc) order —
      // ≤ seedSize rows cross the wire). ----
      val maxLenB = maxPieceLen
      val seedDf = wc.flatMap { case (w, c) =>
        substrings(w, maxLenB).map(p => (p, c))
      }.toDF("p", "c")
        .groupBy("p").agg(sum(col("c").cast("decimal(38,0)")).as("m"))
        .persist()
      val chars = seedDf.filter(length(col("p")) === 1)
        .select(col("p"), col("m").cast("long"))
        .as[(String, Long)].collect() // the alphabet
      val keptMulti = seedDf.filter(length(col("p")) > 1)
        .withColumn("m2", col("m") * length(col("p")).cast("decimal(38,0)"))
        .orderBy(col("m2").desc, col("p").asc)
        .limit(math.max(0, seedSize - chars.length))
        .select(col("p"), col("m2").cast("long"))
        .as[(String, Long)].collect()
      seedDf.unpersist()
      val seed = (chars ++ keptMulti).sortBy(_._1)

      var pieces = seed.map(_._1)
      var scaled = seed.map(s => BigInt(s._2))

      def emRound(): Unit = {
        val lp = logProbs(pieces, scaled)
        val bc = spark.sparkContext.broadcast(
          (pieces.zipWithIndex.toMap: collection.Map[String, Int], lp))
        val agg = wc.mapPartitions { it =>
          val (idx, l) = bc.value
          it.flatMap { case (w, c) => expectedScaled(w, c, idx, l, maxLenB) }
        }.toDF("pid", "sc")
          .groupBy("pid").agg(sum(col("sc").cast("decimal(38,0)")).as("sc"))
          .collect() // |vocab| rows — the codebook discipline
        val acc = agg.map(r => r.getInt(0) ->
          BigInt(r.getDecimal(1).toBigInteger)).toMap
        scaled = pieces.indices.map(i => acc.getOrElse(i, BigInt(0))).toArray
        bc.destroy()
      }

      var continue = true
      while (continue) {
        (0 until emRounds).foreach(_ => emRound())
        if (pieces.length > vocabSize) {
          val keptP = prune(pieces, scaled, vocabSize, keepFrac)
          // same fixed-point stop as trainUnigramLocal (alphabet floor)
          if (keptP.length == pieces.length) continue = false
          val byPiece = pieces.zip(scaled).toMap
          pieces = keptP
          scaled = keptP.map(byPiece)
        } else continue = false
      }
      emRound()
      finishVocab(pieces, scaled)
    } finally wc.unpersist()
  }

  /**
   * Viterbi segmentation of one word under (piece → logp). Maximizes
   * total log-prob; exact-tie preference is the LONGER last piece
   * (then the DP prefix already fixed) — a total, deterministic order.
   * A position no piece reaches emits the single char with a floor
   * penalty (unseen chars at encode time), so encoding totals.
   */
  def viterbiWord(w: String, logp: collection.Map[String, Double],
                  maxPieceLen: Int = 8, unkLogp: Double = -30.0): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(0)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lmax = math.min(maxPieceLen, i)
      while (l <= lmax) {
        if (best(i - l) != Double.NegativeInfinity) {
          val lp = logp.getOrElse(w.substring(i - l, i),
            if (l == 1) unkLogp else Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity) {
            val cand = best(i - l) + lp
            // strictly-greater OR equal-with-longer-piece wins; scanning
            // l ascending means the last writer at equality is longest
            if (cand >= best(i)) { best(i) = cand; back(i) = l }
          }
        }
        l += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    i = n
    while (i > 0) { val l = back(i); out.prepend(w.substring(i - l, i)); i -= l }
    out.toList
  }

  /**
   * Production-rate encoder over the distinct-word table — the
   * [[Bpe.encodeWordsFast]] shape: vocab broadcast once as a logp map,
   * one narrow pass, (w, pieces) out; join back on `w` for per-doc
   * token streams.
   */
  def viterbiEncode(docs: DataFrame, textCol: String,
                    vocab: Seq[(String, Double)], maxPieceLen: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      vocab.map { case (p, pr) => (p, math.log(pr)) }.toMap: collection.Map[String, Double])
    val maxLenB = maxPieceLen
    Bpe.wordCounts(docs, textCol).select(col("w")).as[String]
      .mapPartitions(it => it.map(w => (w, viterbiWord(w, bc.value, maxLenB))))
      .toDF("w", "pieces")
  }
}
