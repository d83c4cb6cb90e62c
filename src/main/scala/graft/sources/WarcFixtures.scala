package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic WARC fixtures for the l50 oracle query, following the
 * l48 pattern (`VideoFixtures`): payloads are BUILT byte-exactly from
 * construction parameters, and the DuckDB oracle is a VALUES relation
 * of THE SAME parameters — never the parser's output — so a match
 * proves `Warc`'s record walk reads back exactly what the construction
 * wrote, on engine-independent ground truth.
 *
 * Three files, one per ingest path: plain WARC (warcinfo + two
 * responses), gzip multi-member (the real `.warc.gz` layout: one gzip
 * member per record; response + non-HTTP request record), and a
 * truncated file (valid response followed by a record whose declared
 * Content-Length overruns the bytes — prefix semantics keep record 0).
 */
object WarcFixtures {

  private[sources] def crlf(lines: String*): String = lines.mkString("", "\r\n", "\r\n")

  /** One WARC record: version + headers + blank + payload + \r\n\r\n.
    * `extraHeaders` carries record-type-specific fields (a revisit's
    * `WARC-Refers-To`/`WARC-Profile`). */
  private[sources] def record(warcType: String, uri: Option[String],
                     payload: Array[Byte],
                     extraHeaders: Seq[String] = Nil): Array[Byte] = {
    val head = crlf(
      Seq("WARC/1.0", s"WARC-Type: $warcType") ++
        uri.map(u => s"WARC-Target-URI: $u") ++ extraHeaders ++
        Seq("WARC-Date: 2024-01-01T00:00:00Z",
          s"Content-Length: ${payload.length}", ""): _*)
    head.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private[sources] def http(status: String, body: String): Array[Byte] =
    (crlf(s"HTTP/1.1 $status", "Content-Type: text/html", "") + body)
      .getBytes("UTF-8")

  private[sources] def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  // construction parameters (the oracle's ground truth)
  private val InfoBody = "software: graft-warc"
  private val BodyA = "<html>hello a</html>"
  private val BodyMiss = "not found here"
  private val BodyB = "<html>b page</html>"
  private val ReqB = "GET /b HTTP/1.1"
  private val BodyMoved = "moved"
  private val httpOverhead = http("200 OK", "").length // status+headers+blank

  private def fileA: Array[Byte] =
    record("warcinfo", None, InfoBody.getBytes("UTF-8")) ++
      record("response", Some("http://example.com/a"), http("200 OK", BodyA)) ++
      record("response", Some("http://example.com/missing"), http("404 Not Found", BodyMiss))

  /** Multi-member gzip: each record its own member, as crawlers write.
    * The trailing REVISIT member (empty payload, `WARC-Refers-To`
    * pointing at the response it re-observed — Common Crawl's native
    * dedup signal) certifies the refers_to header surfaces. */
  private def fileB: Array[Byte] =
    gz(record("response", Some("http://example.org/b"), http("200 OK", BodyB))) ++
      gz(record("request", Some("http://example.org/b"), ReqB.getBytes("UTF-8"))) ++
      gz(record("revisit", Some("http://example.org/b"), Array.emptyByteArray,
        Seq("WARC-Refers-To: <urn:rec:b0>",
          "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest")))

  /** Record 0 valid; record 1 declares 9999 payload bytes it lacks. */
  private def fileC: Array[Byte] =
    record("response", Some("http://example.net/c"), http("301 Moved", BodyMoved)) ++
      crlf("WARC/1.0", "WARC-Type: response", "Content-Length: 9999", "")
        .getBytes("UTF-8") ++ "short".getBytes("UTF-8")

  /** (payload, expected records) — expectations from construction
    * parameters only. */
  lazy val fixtures: Seq[(WarcFile, Seq[WarcRecord])] = Seq(
    (WarcFile(1L, fileA), Seq(
      WarcRecord(1L, 0L, "warcinfo", "", InfoBody.length.toLong, 0L,
        InfoBody.length.toLong, InfoBody, "utf-8"),
      WarcRecord(1L, 1L, "response", "http://example.com/a",
        (httpOverhead + BodyA.length).toLong, 200L, BodyA.length.toLong, BodyA, "utf-8"),
      WarcRecord(1L, 2L, "response", "http://example.com/missing",
        (http("404 Not Found", "").length + BodyMiss.length).toLong, 404L,
        BodyMiss.length.toLong, BodyMiss, "utf-8"))),
    (WarcFile(2L, fileB), Seq(
      WarcRecord(2L, 0L, "response", "http://example.org/b",
        (httpOverhead + BodyB.length).toLong, 200L, BodyB.length.toLong, BodyB, "utf-8"),
      WarcRecord(2L, 1L, "request", "http://example.org/b",
        ReqB.length.toLong, 0L, ReqB.length.toLong, ReqB, "utf-8"),
      WarcRecord(2L, 2L, "revisit", "http://example.org/b",
        0L, 0L, 0L, "", "utf-8", "<urn:rec:b0>"))),
    (WarcFile(3L, fileC), Seq(
      WarcRecord(3L, 0L, "response", "http://example.net/c",
        (http("301 Moved", "").length + BodyMoved.length).toLong, 301L,
        BodyMoved.length.toLong, BodyMoved, "utf-8"))))

  /** The l50 input frame. */
  def dataset(spark: SparkSession): Dataset[WarcFile] = {
    import spark.implicits._
    spark.createDataset(fixtures.map(_._1))
  }

  /** The l50 DuckDB oracle: VALUES of the construction-side records. */
  def oracleSql: String = {
    val rows = fixtures.flatMap(_._2).map { r =>
      s"(CAST(${r.file_id} AS BIGINT), CAST(${r.rec_idx} AS BIGINT), " +
        s"'${r.warc_type}', '${r.target_uri}', " +
        s"CAST(${r.content_length} AS BIGINT), CAST(${r.http_status} AS BIGINT), " +
        s"CAST(${r.body_len} AS BIGINT), '${r.body_head}', '${r.charset}', " +
        s"'${r.refers_to}')"
    }.mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(file_id, rec_idx, warc_type, " +
      "target_uri, content_length, http_status, body_len, body_head, charset, " +
      "refers_to) ORDER BY file_id, rec_idx"
  }
}
