package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** CDC merge semantics: upsert replaces, delete removes, insert adds,
  * untouched keys pass through; degenerate ops behave sanely. */
class CdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upsert / delete / insert / pass-through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "text")
    val changes = Seq((2L, "U", "b2"), (3L, "D", ""), (9L, "I", "i"))
      .toDF("k", "op", "text")
    val out = Cdc.applyChanges(base, changes, "k", "op", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 9L -> "i"))
  }

  test("delete of a missing key is a no-op; insert of an existing key upserts") {
    val base = Seq((1L, "a")).toDF("k", "text")
    val changes = Seq((7L, "D", ""), (1L, "I", "a2")).toDF("k", "op", "text")
    val out = Cdc.applyChanges(base, changes, "k", "op", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a2"))
  }
}
