package graft.ops

import graft.SharedSpark
import graft.operators.Expectations
import graft.operators.Expectations.Rule
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def df = Seq[(java.lang.Long, String)](
    (1L, "ok"), (-2L, "ok"), (3L, null), (null, "bad")
  ).toDF("v", "s")

  private val rules = Seq(
    Rule("v_positive", col("v") > 0),
    Rule("s_present", col("s").isNotNull))

  test("annotate lists the failed rules per row; nulls fail closed") {
    val got = Expectations.annotate(df, rules)
      .select(col("v"), col("__violations"))
      .collect().map(r => (Option(r.get(0)), r.getSeq[String](1).toList)).toSet
    assert(got === Set(
      (Some(1L), Nil),
      (Some(-2L), List("v_positive")),
      (Some(3L), List("s_present")),
      (None, List("v_positive")))) // null v fails v_positive, s present
  }

  test("split partitions cleanly and keeps the original schema on the clean side") {
    val (clean, bad) = Expectations.split(df, rules)
    assert(clean.columns.toSeq == Seq("v", "s"))
    assert(clean.select("v").as[Long].collect().toSeq == Seq(1L))
    assert(bad.count() == 3)
    assert(bad.columns.contains("__violations"))
  }

  test("metrics: one row per rule, counts agree with split, one aggregation job") {
    val m = Expectations.metrics(df, rules)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("v_positive") == (2L, 2L))
    assert(m("s_present") == (3L, 1L))
    // plan shape: exactly one aggregate pass (conditional sums), no join
    val p = Expectations.metrics(df, rules).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), p)
  }

  test("rule names survive verbatim: apostrophes, backslashes, unicode") {
    for (name <- Seq("it's fine", "path\\with\\backslashes", "règle–✓")) {
      val m = Expectations.metrics(df, Seq(Rule(name, col("v").isNotNull)))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(m.toSeq == Seq((name, 3L, 1L)), s"name '$name' corrupted")
    }
  }
}
