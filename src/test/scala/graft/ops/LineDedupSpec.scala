package graft.ops

import graft.SharedSpark
import graft.dedup.LineDedup
import org.scalatest.funsuite.AnyFunSuite

/** [[LineDedup.removeBoilerplateLines]] — the policy edges the oracle
  * query's corpus shape doesn't isolate.
  */
class LineDedupSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minDocs: Int = 3) =
    LineDedup.removeBoilerplateLines(
      docs.toDF("id", "text"), "id", "text", minDocs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("document frequency counts distinct docs, not occurrences") {
    // "spam" appears 3 times but only in doc 1 → kept; "footer" is in
    // 3 distinct docs → dropped everywhere
    val out = run(Seq(
      (1L, "spam\nspam\nspam\nfooter"),
      (2L, "alpha\nfooter"),
      (3L, "beta\nfooter")))
    assert(out(1L) == ((4L, 3L, "spam\nspam\nspam")))
    assert(out(2L) == ((2L, 1L, "alpha")))
    assert(out(3L) == ((2L, 1L, "beta")))
  }

  test("threshold boundary: df = minDocs drops, df = minDocs-1 keeps") {
    val out = run(Seq(
      (1L, "two\nthree"), (2L, "two\nthree"), (3L, "three\nsolo")))
    // "three" df=3 dropped; "two" df=2 kept
    assert(out(1L)._3 == "two")
    assert(out(3L)._3 == "solo")
  }

  test("empty and whitespace lines are structural: never counted, always kept") {
    val out = run(Seq(
      (1L, "a\n\n  \nb"), (2L, "\nc\n  "), (3L, "\nd\n  ")))
    assert(out(1L) == ((4L, 4L, "a\n\n  \nb")))
    // trimming decides membership: ' footer' and 'footer' are one key
    val out2 = run(Seq(
      (1L, "x\n footer"), (2L, "y\nfooter "), (3L, "z\nfooter")))
    assert(out2(1L)._3 == "x" && out2(2L)._3 == "y" && out2(3L)._3 == "z")
  }
}
