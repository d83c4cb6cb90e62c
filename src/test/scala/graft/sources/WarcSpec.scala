package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** WARC record-walk specs: fixture parity (construction-side ground
  * truth), gzip multi-member transparency, prefix semantics on
  * truncation, and the never-throw fuzz contract. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("parseFile reads back every fixture's construction-side records") {
    WarcFixtures.fixtures.foreach { case (file, expected) =>
      val got = Warc.parseFile(file.file_id, file.payload)
      assert(got == expected, s"file ${file.file_id}")
    }
  }

  test("records() distributes the walk and preserves per-file order keys") {
    val ds = Warc.records(WarcFixtures.dataset(spark))
    val got = ds.collect().sortBy(r => (r.file_id, r.rec_idx)).toSeq
    assert(got == WarcFixtures.fixtures.flatMap(_._2))
  }

  test("a record walk stops at the first malformed record, keeping the prefix") {
    // fixture C is exactly this case: declared Content-Length overruns
    val (file, expected) = WarcFixtures.fixtures(2)
    assert(expected.length == 1)
    assert(Warc.parseFile(file.file_id, file.payload) == expected)
    // corrupt the version line of record 1 in file A: record 0 survives
    val (a, expA) = WarcFixtures.fixtures.head
    val bytes = a.payload.clone()
    val secondRec = indexOfSlice(bytes, "WARC/1.0".getBytes("UTF-8"), 1)
    assert(secondRec > 0)
    bytes(secondRec) = 'X'.toByte
    assert(Warc.parseFile(9L, bytes) == Seq(expA.head.copy(file_id = 9L)))
  }

  test("parseFile never throws on mutated, truncated, or garbage payloads") {
    val rnd = new scala.util.Random(77)
    val seeds = WarcFixtures.fixtures.map(_._1.payload)
    (1 to 400).foreach { i =>
      val payload = rnd.nextInt(4) match {
        case 0 => // random truncation
          val s = seeds(rnd.nextInt(seeds.length))
          s.take(1 + rnd.nextInt(s.length))
        case 1 => // random single-byte mutations
          val s = seeds(rnd.nextInt(seeds.length)).clone()
          (0 until 1 + rnd.nextInt(5)).foreach { _ =>
            s(rnd.nextInt(s.length)) = rnd.nextInt().toByte }
          s
        case 2 => // gzip magic + garbage (broken compressed stream)
          Array(0x1f.toByte, 0x8b.toByte) ++ Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
        case _ => Array.fill(rnd.nextInt(256))(rnd.nextInt().toByte)
      }
      val recs = Warc.parseFile(i.toLong, payload) // must not throw
      recs.foreach { r =>
        assert(r.file_id == i.toLong && r.rec_idx >= 0 && r.content_length >= 0)
      }
    }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      if ((0 until needle.length).forall(j => hay(i + j) == needle(j))) return i
      i += 1
    }
    -1
  }
}
