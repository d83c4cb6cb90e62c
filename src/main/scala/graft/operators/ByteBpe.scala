package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * BYTE-level BPE with regex pre-tokenization — the GPT-2/3/4-family
 * tokenizer lineage (Radford et al. 2019, the published `encoder.py`
 * algorithm), as opposed to [[Bpe]]'s code-point-symbol trainer over
 * whitespace-split words. Production token budgets (packing l80/l89,
 * token-budget sampling l90, fertility l94) price in THESE tokens, so
 * the trainer that produces them belongs next to the char-level one.
 *
 * The three published ingredients, all public:
 *  1. the PRE-TOKENIZER regex — contractions (`'s`, `'t`, …), then
 *     letter runs / digit runs / punctuation runs each optionally
 *     absorbing ONE leading space, then whitespace (a run keeps its
 *     last space attached to the next token via the `\s+(?!\S)`
 *     lookahead). Spaces are DATA here: " the" and "the" are distinct
 *     pre-tokens with distinct statistics — the defining difference
 *     from word-level BPE.
 *  2. the BYTES→UNICODE table — every byte maps to a printable BMP
 *     code point (printable ASCII and Latin-1 map to themselves, the
 *     33 controls + space + DEL + 0xAD shift up by 256), so merges
 *     operate on strings while covering arbitrary UTF-8 (no [UNK]
 *     ever: any byte sequence symbolizes).
 *  3. plain BPE over the mapped symbols — [[Bpe.trainMergesLocal]]'s
 *     exact argmax (count desc, pair code-point-asc, count ≥ 2) and
 *     [[Bpe.encodeWord]]'s lowest-rank encode loop, both REUSED so the
 *     byte-level mode inherits the spec-pinned merge semantics.
 *
 * Scale shape: the ONE corpus-sized operation is [[preTokenCounts]] —
 * a codegen'd `regexp_extract_all` explode into a map-side-combined
 * hash agg (the [[Bpe.wordCounts]] geometry). Training then runs on
 * the distinct pre-token table: `minCount` prunes the web-scale hapax
 * tail BEFORE the driver-side endgame collect, the same boundary
 * discipline as the other three trainer families. Encoding never
 * collects — the rank table broadcasts and distinct pre-tokens encode
 * in one `mapPartitions` pass.
 */
object ByteBpe {

  /** The published GPT-2 pre-tokenizer pattern. `(?U)` switches Java's
    * `\s` to UNICODE_CHARACTER_CLASS semantics — the original runs
    * under Python's `regex` module where `\s` is Unicode (NBSP,
    * ideographic space, …); without the flag Java's ASCII-only `\s`
    * would absorb non-ASCII whitespace into punctuation runs and
    * silently diverge from the published tokenization on scraped HTML.
    * `\p{L}`/`\p{N}` and the `(?!\S)` lookahead are portable as-is. */
  val PreTokenPattern: String =
    "(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+"

  /** byte value (0–255) → mapped BMP char. The GPT-2 construction:
    * bytes in ['!','~'] ∪ ['¡','¬'] ∪ ['®','ÿ'] map to themselves;
    * the remaining 68 (controls, space, DEL, 0x7F–0xA0, 0xAD) map to
    * 256+n in first-gap order — so space is 'Ġ' (U+0120), newline
    * 'Ċ' (U+010A). Bijective: [[fromByteUnits]] inverts exactly. */
  val byteEncoder: Array[Char] = {
    val self = ((('!'.toInt to '~'.toInt) ++ ('¡'.toInt to '¬'.toInt) ++
      ('®'.toInt to 'ÿ'.toInt)): Seq[Int]).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (self(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** mapped char → original byte value. */
  val byteDecoder: Map[Char, Int] =
    byteEncoder.zipWithIndex.map { case (c, b) => (c, b) }.toMap

  /** UTF-8 bytes of a pre-token, each mapped through [[byteEncoder]] —
    * the symbol string BPE trains and encodes on. Every output char is
    * a single BMP code point, so [[Bpe.encodeWord]]'s code-point
    * symbolization sees exactly one symbol per original byte. */
  def toByteUnits(tok: String): String = {
    val bytes = tok.getBytes(UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    bytes.foreach(b => sb.append(byteEncoder(b & 0xFF)))
    sb.toString
  }

  /** Inverse of [[toByteUnits]] — mapped units back to the original
    * string (exact round trip for any input; unmapped chars cannot
    * occur in well-formed units and throw, which is correct for an
    * internal inverse, not a decode of untrusted data). */
  def fromByteUnits(units: String): String = {
    val bytes = new Array[Byte](units.length)
    var i = 0
    while (i < units.length) {
      bytes(i) = byteDecoder(units.charAt(i)).toByte
      i += 1
    }
    new String(bytes, UTF_8)
  }

  /** Distinct pre-token frequencies — the corpus-sized shuffle of the
    * byte-level family (the [[Bpe.wordCounts]] twin): a codegen'd
    * `regexp_extract_all` explode + one map-side-combined hash agg.
    * `minCount` prunes the hapax tail at the same boundary. NOTE the
    * tokens here are RAW text (spaces included); mapping through the
    * byte table happens on the distinct table, never per occurrence. */
  def preTokenCounts(docs: DataFrame, textCol: String,
                     minCount: Long = 1L): DataFrame = {
    val counts = docs
      .select(explode(regexp_extract_all(
        col(textCol), lit(PreTokenPattern), lit(0))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    if (minCount > 1L) counts.filter(col("c") >= minCount) else counts
  }

  /** Train byte-level merges: the `minCount`-pruned distinct pre-token
    * table maps to byte units and collects ONCE into
    * [[Bpe.trainMergesLocal]] (the driver endgame every real trainer
    * uses — one in-memory scan per merge instead of one Spark job;
    * the collect is |distinct pre-tokens| rows AFTER the prune).
    * Returns (a, b, merged-count) in training order, symbols in
    * mapped-unit space. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 1L): Seq[(String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = preTokenCounts(docs, textCol, minCount)
      .as[(String, Long)].collect().toSeq
      .map { case (t, c) => (toByteUnits(t).map(_.toString).toArray, c) }
    Bpe.trainMergesLocal(vocab, nMerges)
  }

  /** Encode one pre-token against a rank-ordered merge table —
    * [[Bpe.encodeWord]] over the mapped units. Never [UNK]: with no
    * applicable merge the pieces are the single-byte units. */
  def encodeToken(tok: String, rank: Map[(String, String), Int]): Seq[String] =
    Bpe.encodeWord(toByteUnits(tok), rank)

  /** Distributed encoder ([[Bpe.encodeWordsFast]] geometry): the rank
    * map broadcasts once, every DISTINCT pre-token encodes in one
    * `mapPartitions` pass. Output (units, syms, n_syms) — `units` is
    * the mapped form (the conventional display of byte-level vocab:
    * 'Ġthe', 'Ċ'), so the key column is whitespace-unambiguous. */
  def encodeTokensFast(docs: DataFrame, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    preTokenCounts(docs, textCol).select(col("tok")).as[String]
      .mapPartitions { it =>
        it.map { t =>
          val units = toByteUnits(t)
          val syms = Bpe.encodeWord(units, bc.value)
          (units, syms, syms.length.toLong)
        }
      }
      .toDF("units", "syms", "n_syms")
  }

  /** Per-document byte-level token count — the number the packing /
    * token-budget operators price with. Same two stages: corpus-sized
    * pre-token explode keyed by document, then a broadcast-rank encode
    * of the DISTINCT tokens joined back (shuffle-hash: the distinct
    * table can be large but each side hashes, no sort). EVERY input
    * document gets a row — a text yielding zero pre-tokens reports
    * n_tokens = 0 rather than vanishing (a dropped row reads as "doc
    * absent" to a downstream budget join, not as "doc is empty"). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    // pre-aggregate (doc, token) MULTIPLICITIES before the join — the
    // sequencePackBpe pattern: a doc repeating ' the' 10,000 times
    // carries ONE row with __m = 10,000 through the join, not 10,000
    // occurrence rows (the explode itself map-side combines into this agg)
    val dm = docs.select(col(idCol), explode(regexp_extract_all(
        col(textCol), lit(PreTokenPattern), lit(0))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("__m"))
    val perTok = dm.select(col("tok")).distinct().as[String]
      .mapPartitions { it =>
        it.map(t => (t, Bpe.encodeWord(toByteUnits(t), bc.value).length.toLong))
      }
      .toDF("tok", "n_syms")
    val counted = dm.join(perTok.hint("shuffle_hash"), Seq("tok"))
      .groupBy(idCol).agg(sum(col("__m") * col("n_syms")).as("__nt"))
    docs.select(col(idCol))
      .join(counted.hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__nt"), lit(0L)).as("n_tokens"))
  }
}
