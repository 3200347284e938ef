package graft.ops

import graft.SharedSpark
import graft.operators.IntervalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** [[IntervalJoin.binnedOverlap]] must equal the naive overlap join for
  * every bin width — including intervals spanning many bins (the
  * duplicate-emission hazard) and zero-length/edge-touching intervals —
  * and must plan as an equi-join, never a nested loop.
  */
class IntervalJoinSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def randomIntervals(rnd: Random, n: Int, tag: String): DataFrame =
    (1 to n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"$tag$i", rnd.nextInt(4), s, s + rnd.nextInt(150).toLong)
    }.toDF("id", "k", "s", "e")

  private def naive(l: DataFrame, r: DataFrame): Set[(String, String)] = {
    val lr = l.select(col("id").as("l_id"), col("k"), col("s").as("ls"), col("e").as("le"))
    val rr = r.select(col("id").as("r_id"), col("k"), col("s").as("rs"), col("e").as("re"))
    lr.join(rr, "k").filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("l_id", "r_id").collect().map(x => (x.getString(0), x.getString(1))).toSet
  }

  test("binned ≡ naive across bin widths; no duplicate pairs") {
    val rnd = new Random(5)
    val l = randomIntervals(rnd, 120, "L")
    val r = randomIntervals(rnd, 120, "R")
    val expected = naive(l, r)
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val got = IntervalJoin.binnedOverlap(l, r, Seq("k"), "s", "e", w)
        .select("l_id", "r_id").collect()
        .map(x => (x.getString(0), x.getString(1)))
      assert(got.length == got.toSet.size, s"duplicates at width $w")
      assert(got.toSet == expected, s"wrong pairs at width $w")
    }
  }

  test("edge cases: touching endpoints, zero-length, inverted intervals") {
    val l = Seq(("a", 0, 0L, 10L), ("b", 0, 20L, 20L), ("inv", 0, 9L, 3L))
      .toDF("id", "k", "s", "e")
    val r = Seq(("x", 0, 10L, 20L), ("y", 0, 21L, 30L)).toDF("id", "k", "s", "e")
    val got = IntervalJoin.binnedOverlap(l, r, Seq("k"), "s", "e", 8L)
      .select("l_id", "r_id").collect().map(x => (x.getString(0), x.getString(1))).toSet
    // a–x touch at 10 (closed intervals overlap); b–x touch at 20;
    // inverted interval drops; b–y do not overlap (21 > 20)
    assert(got == Set(("a", "x"), ("b", "x")))
  }

  test("plans an equi-join, not a nested loop") {
    val l = Seq(("a", 0, 0L, 10L)).toDF("id", "k", "s", "e")
    val r = Seq(("x", 0, 5L, 6L)).toDF("id", "k", "s", "e")
    val plan = IntervalJoin.binnedOverlap(l, r, Seq("k"), "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in:\n$plan")
  }
}
