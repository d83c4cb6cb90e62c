package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.Dataset

/**
 * JSONL shard ingest: the distribution format most LLM corpora
 * actually arrive in today — `.jsonl.{gz,zst,xz,bz2}` shard files, one
 * JSON object per line, one document per object (the layout HF
 * datasets, RedPajama/Dolma-style corpora, and most crawl releases
 * ship). The reference has no connector layer at all (SURVEY §2.2);
 * this is the north-star composition of the certified codec legs
 * ([[Tar.codecStream]]'s five transparent wrappings) with Spark's own
 * `from_json` for the per-line parse.
 *
 * The line walk is STREAMING like [[Warc.parseFile]] and the round-19
 * tar walk: lines are read off the decompressing `InputStream` one at
 * a time, so peak memory is O(longest line), never O(shard) — a 10 GB
 * decompressed shard walks in constant memory. Guards are CPU-side:
 * [[MaxLineBytes]] per line (a "line" past 16 MiB is not a JSONL
 * record) and [[Tar.MaxArchiveBytes]] total consumed, both degrading
 * to prefix semantics (every line before the first bad one is kept).
 *
 * Scale: one narrow flatMap per shard — partition count follows the
 * shard file list exactly as a real `spark.read` would; the JSON
 * field extraction stays in Catalyst (`from_json`), NOT here, so
 * column pruning and codegen apply to the parse.
 */
object Jsonl {

  final case class JsonlLine(file_id: Long, line_idx: Long, line: String)

  /** A JSONL record past this is malformed input, not a document. */
  val MaxLineBytes: Int = 1 << 24

  /** Pure single-shard walk (unit-testable without Spark): transparent
    * codec sniff, then one row per non-empty line. Prefix semantics on
    * malformed/truncated input; never throws. */
  def parseShard(fileId: Long, payload: Array[Byte]): Seq[JsonlLine] = {
    val in = Tar.codecStream(payload).getOrElse(return Seq.empty)
    val out = scala.collection.mutable.ArrayBuffer[JsonlLine]()
    try {
      var idx = 0L
      var consumed = 0L
      val buf = new java.io.ByteArrayOutputStream(256)
      var c = in.read()
      var sawAny = c >= 0
      while (c >= 0 && consumed < Tar.MaxArchiveBytes) {
        if (c == '\n') {
          emit(fileId, idx, buf, out).foreach(_ => idx += 1)
          buf.reset()
        } else {
          buf.write(c)
          if (buf.size > MaxLineBytes) return out.toSeq // malformed: prefix
        }
        consumed += 1
        c = in.read()
      }
      // final line without a trailing newline still counts
      if (sawAny) emit(fileId, idx, buf, out)
    } catch { case NonFatal(_) => () } // corrupt codec stream: prefix
    finally { try in.close() catch { case NonFatal(_) => () } }
    out.toSeq
  }

  /** Skips blank lines (a JSONL writer's trailing newline is not a
    * record); strips one trailing '\r' (CRLF shards exist). */
  private def emit(fileId: Long, idx: Long, buf: java.io.ByteArrayOutputStream,
                   out: scala.collection.mutable.ArrayBuffer[JsonlLine]): Option[Unit] = {
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1
            else bytes.length
    if (n == 0) None
    else { out += JsonlLine(fileId, idx, new String(bytes, 0, n, "UTF-8")); Some(()) }
  }

  /** The distributed form — [[Warc.records]]' JSONL twin. */
  def lines(files: Dataset[WarcFile]): Dataset[JsonlLine] = {
    import files.sparkSession.implicits._
    files.flatMap(f => parseShard(f.file_id, f.payload))
  }

  // --------------------------------------------- construction (fixtures)

  /** Minimal correct JSON string literal: quote, backslash, and C0
    * controls escaped — everything else (full unicode) passes through
    * raw, which is valid JSON and what real shard writers emit. */
  private[sources] def jsonStr(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < 0x20 =>
        b.append(String.format(java.util.Locale.ROOT, "\\u%04x", Int.box(c.toInt)))
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** The l150 construction half: one `.jsonl` shard holding the given
    * documents as `{"id":…,"text":…}` lines, outer wrapping rotated by
    * shard id across all five transparent codecs
    * (gzip/plain/zstd/xz/bzip2). */
  def syntheticShard(shardId: Long, docs: Seq[(Long, String)]): WarcFile = {
    val body = docs.map { case (id, t) => s"""{"id":$id,"text":${jsonStr(t)}}""" }
      .mkString("", "\n", "\n")
    WarcFile(shardId, Tar.wrap(shardId, body.getBytes("UTF-8")))
  }
}
