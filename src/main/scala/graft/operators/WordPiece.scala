package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WordPiece tokenizer — the third production tokenizer family next to
 * [[Bpe]] (merge-frequency) and [[Unigram]] (EM likelihood): the BERT
 * lineage (Schuster & Nakajima, ICASSP 2012; Devlin et al. 2019).
 * North-star extension: the reference (/root/reference/src/lib.rs:1-957)
 * has no text surface.
 *
 * TRAINING is BPE-shaped (merge loop over the word-frequency table
 * with `##`-marked continuation symbols) but the merge choice is the
 * LIKELIHOOD score `count(ab) / (count(a)·count(b))` — the pair whose
 * fusion most increases corpus likelihood under a unigram symbol
 * model — not the raw pair count. Scores are compared EXACTLY by
 * BigInt cross-multiplication (no float ratio can tie-break
 * differently across runs); ties fall to higher pair count, then
 * code-point order ([[Bpe]]'s cpLt discipline).
 *
 * ENCODING is greedy longest-match-first over the trained vocabulary:
 * at each position take the LONGEST vocab entry matching (continuation
 * positions match `##`-prefixed entries); a word with any unmatchable
 * position becomes `[UNK]` whole (the BERT contract — no partial
 * emission).
 *
 * 100 TB shape: the corpus collapses ONCE to [[Bpe.wordCounts]] (the
 * only corpus-sized shuffle — map-side combined); the merge loop runs
 * on the collected |vocab|-bounded table driver-side (the
 * [[Bpe.trainMergesLocal]] endgame every real trainer uses — the
 * word-frequency table is megabytes where the corpus is terabytes);
 * encoding broadcasts the vocab once and walks each distinct word in
 * a single `mapPartitions` pass (the [[Bpe.encodeWordsFast]] pattern),
 * then the (word → pieces) table joins back wherever needed.
 */
object WordPiece {

  val Unk = "[UNK]"

  /** Code-point symbolization with `##` continuation marks: first
    * character plain, every subsequent character `##`-prefixed
    * (surrogate-pair safe, like [[Bpe]]'s symbolize). */
  private[operators] def symbolize(w: String): Array[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      val c = w.substring(i, i + n)
      buf += (if (i == 0) c else "##" + c)
      i += n
    }
    buf.toArray
  }

  /** Merged form of an adjacent symbol pair: the continuation mark of
    * the RIGHT side is absorbed ("pl" + "##ay" → "play";
    * "##p" + "##l" → "##pl"). */
  private def fuse(a: String, b: String): String = a + b.stripPrefix("##")

  /** Code-point lexicographic `<` — shared with [[Bpe]] (one
    * definition of the merge tie-break discipline; see the rationale
    * at [[Bpe.cpLt]]). */
  private def cpLt(x: String, y: String): Boolean = Bpe.cpLt(x, y)

  /** Like [[Bpe]]'s merge pass but fusing with [[fuse]] (the right
    * side's ## mark is absorbed) — the one semantic difference, which
    * is why this is not shared. */
  private def mergePass(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      val s = syms(j)
      if (out.nonEmpty && out(out.length - 1) == a && s == b)
        out(out.length - 1) = fuse(a, b)
      else out += s
      j += 1
    }
    out.toArray
  }

  /**
   * Driver-side likelihood-scored merge loop over a symbolized
   * word-frequency vocab — mirrors [[Bpe.trainMergesLocal]]'s shape
   * with the WordPiece objective. Returns the merge list
   * (a, b, merged, pairCount) in training order. Stops early when no
   * pair occurs twice.
   */
  def trainMergesLocal(vocab0: Seq[(Array[String], Long)],
                       nMerges: Int): Seq[(String, String, String, Long)] = {
    var vocab = vocab0.toArray
    val merges = Seq.newBuilder[(String, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val pairC = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symC = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symC.update(syms(i), symC.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairC.update(k, pairC.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      // argmax of count(ab)/(count(a)·count(b)) by exact BigInt
      // cross-multiplication; ties → higher pair count → cp order
      var best: ((String, String), Long) = null
      var bestDen: BigInt = null
      pairC.foreach { e =>
        // a WORD-INITIAL merge whose fused form begins with the literal
        // continuation mark (fuse('#','###') == "##") would be
        // permanently dead vocab: encodeWord's in-band-marker guard
        // rightly refuses it at start == 0. Exclude it at training time
        // so the vocabulary never carries unusable entries.
        val deadEntry = !e._1._1.startsWith("##") && fuse(e._1._1, e._1._2).startsWith("##")
        if (e._2 >= 2L && !deadEntry) {
          val den = BigInt(symC(e._1._1)) * BigInt(symC(e._1._2))
          val better =
            if (best == null) true
            else {
              val cmp = (BigInt(e._2) * bestDen).compare(BigInt(best._2) * den)
              cmp > 0 || (cmp == 0 && (e._2 > best._2 ||
                (e._2 == best._2 && (cpLt(e._1._1, best._1._1) ||
                  (e._1._1 == best._1._1 && cpLt(e._1._2, best._1._2))))))
            }
          if (better) { best = e; bestDen = den }
        }
      }
      if (best == null) exhausted = true
      else {
        val ((a, b), cnt) = best
        merges += ((a, b, fuse(a, b), cnt))
        vocab = vocab.map { case (syms, c) => (mergePass(syms, a, b), c) }
        round += 1
      }
    }
    merges.result()
  }

  /**
   * Train a WordPiece vocabulary: `[UNK]` + the alphabet (every
   * initial symbol, code-point-sorted) + `nMerges` likelihood-scored
   * merges in training order. The corpus collapses once to
   * [[Bpe.wordCounts]]; the collect is |distinct words|-bounded AFTER
   * the `minCount` prune — at true web scale the UNPRUNED distinct-word
   * tail (URLs, hashes, typos) runs to billions of rows, so a count
   * floor is what keeps this boundary driver-sized (every production
   * trainer prunes here; pruned words still encode via the alphabet
   * fallback, they just do not vote on merges). Default 1 preserves
   * the exact small-corpus pins.
   */
  def trainVocab(docs: DataFrame, textCol: String, nMerges: Int,
                 minCount: Long = 1L): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wc = Bpe.wordCounts(docs, textCol, minCount)
      .as[(String, Long)].collect()
    val vocab0 = wc.toSeq.map { case (w, c) => (symbolize(w), c) }
    val alphabet = vocab0.iterator.flatMap(_._1).toSeq.distinct
      .sortWith(cpLt)
    val merges = trainMergesLocal(vocab0, nMerges)
    (Unk +: alphabet) ++ merges.map(_._3)
  }

  /**
   * Greedy longest-match-first encode of one word (the BERT
   * WordPiece algorithm): at each position take the longest vocab
   * entry matching the remaining characters (continuation positions
   * try `##`-prefixed forms); any unmatchable position makes the
   * whole word `[UNK]`. Match boundaries step over full code points.
   *
   * In-band-marker guard: the `##` continuation mark can occur
   * LITERALLY in crawled words ("##header" markdown tokens), whose
   * raw prefixes would otherwise collide with continuation entries at
   * the word-initial position and decode to the wrong text. At
   * start = 0 a candidate that LOOKS like a continuation entry
   * (starts with `##`) is skipped — such a word still encodes via its
   * own word-initial `#` symbol and `###`-style continuations, so the
   * pieces always rebuild the literal word.
   */
  def encodeWord(w: String, vocab: Set[String]): Seq[String] = {
    if (w.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < w.length) {
      var end = w.length
      var found: String = null
      while (found == null && end > start) {
        val cand0 = w.substring(start, end)
        val cand = if (start == 0) cand0 else "##" + cand0
        if (vocab.contains(cand) && !(start == 0 && cand.startsWith("##")))
          found = cand
        else {
          // step back one full code point
          end -= 1
          if (end > start && Character.isLowSurrogate(w.charAt(end))) end -= 1
        }
      }
      if (found == null) return Seq(Unk)
      out += found
      start = end
    }
    out.toSeq
  }

  /**
   * Distributed encoder: the vocab broadcasts once as a Set and every
   * DISTINCT word encodes in one `mapPartitions` pass (the
   * [[Bpe.encodeWordsFast]] geometry — per-word cost is O(len²) worst
   * case on the match walk, independent of vocab size beyond the hash
   * lookups). Output: (w, pieces, is_unk).
   */
  def encodeWordsFast(docs: DataFrame, textCol: String,
                      vocab: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab.toSet)
    Bpe.wordCounts(docs, textCol).select(col("w")).as[String]
      .mapPartitions { it =>
        it.map { w =>
          val pieces = encodeWord(w, bc.value)
          (w, pieces, pieces == Seq(Unk))
        }
      }
      .toDF("w", "pieces", "is_unk")
  }
}
