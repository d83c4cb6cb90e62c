package graft.sources

import org.apache.spark.sql.Dataset

import graft.operators.OfficeZip

/**
 * Generic ZIP archive member ingest (PKWARE APPNOTE — public): the
 * other half of the container-distribution story [[Tar]] opened —
 * plain zip-of-text-files archives (fixture bundles, HF-style dumps,
 * code corpora) rather than the OPC/ODF documents [[OfficeZip]]
 * decodes. The walk reuses [[OfficeZip.centralDirectory]] (EOCD scan,
 * zip64 locator/record, extended-information extras) and
 * [[OfficeZip.entryBytes]] (local-header re-read, stored + raw-deflate
 * with the capped inflate), so the structural parser is certified once
 * and shared.
 *
 * Every NON-DIRECTORY central-directory entry surfaces as (file_id,
 * member_idx, name, size, method, UTF-8 text head); entries the reader
 * refuses (encryption flag set, unknown method) stay VISIBLE with an
 * empty head — listing and readability are separate facts. Malformed
 * input degrades to the entries before the first bad record (the
 * central-directory walk's prefix semantics).
 *
 * Scale: one narrow flatMap per archive — the [[Warc.records]] /
 * [[Tar.members]] geometry; retained text never exceeds `headBytes`
 * per member.
 */
object Zip {

  final case class ZipMember(file_id: Long, member_idx: Long, name: String,
                             size: Long, method: Long, text_head: String)

  /** Pure single-archive walk (unit-testable without Spark). */
  def parseArchive(fileId: Long, payload: Array[Byte],
                   headBytes: Int): Seq[ZipMember] =
    OfficeZip.centralDirectory(payload).map { entries =>
      entries.filterNot(_.name.endsWith("/")).zipWithIndex.map { case (e, i) =>
        val head = OfficeZip.entryBytes(payload, e)
          .map(b => new String(b, 0, math.min(b.length, headBytes), "UTF-8"))
          .getOrElse("") // encrypted / unknown method: visible, not readable
        ZipMember(fileId, i.toLong, e.name, e.uncompSize, e.method.toLong, head)
      }
    }.getOrElse(Seq.empty)

  /** The distributed form — [[Tar.members]]' zip twin. */
  def members(files: Dataset[WarcFile], headBytes: Int = 1 << 20): Dataset[ZipMember] = {
    import files.sparkSession.implicits._
    files.flatMap(f => parseArchive(f.file_id, f.payload, headBytes))
  }
}
