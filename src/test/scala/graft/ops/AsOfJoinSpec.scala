package graft.ops

import graft.SharedSpark
import graft.operators.AsOfJoin
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SharedSpark {

  private def asMap(rows: Array[Row], key: String, value: String): Map[Any, Any] =
    rows.map(r => r.getAs[Any](key) -> r.getAs[Any](value)).toMap

  test("backward as-of: latest right at-or-before each left ts, per key") {
    import spark.implicits._
    val left = Seq(
      ("u1", 10L, "e1"), ("u1", 20L, "e2"), ("u1", 5L, "e0"),
      ("u2", 10L, "e3")
    ).toDF("k", "ts", "ev")
    val right = Seq(
      ("u1", 8L, 1.0), ("u1", 15L, 2.0), ("u2", 10L, 9.0), ("u3", 1L, 5.0)
    ).toDF("k", "ts", "v")

    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v")).collect()
    val byEv = asMap(out, "ev", "asof_v")
    assert(byEv("e0") == null)          // nothing at or before ts=5
    assert(byEv("e1") == 1.0)           // right@8
    assert(byEv("e2") == 2.0)           // right@15
    assert(byEv("e3") == 9.0)           // equal-ts right row IS visible
  }

  test("tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq(("u1", 100L, "a"), ("u1", 12L, "b")).toDF("k", "ts", "ev")
    val right = Seq(("u1", 10L, 1.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v"),
      tolerance = Some(5L)).collect()
    val byEv = asMap(out, "ev", "asof_v")
    assert(byEv("b") == 1.0)            // within 5
    assert(byEv("a") == null)           // 90 behind → stale
  }

  test("right rows with null payload fields still win as the latest match") {
    import spark.implicits._
    val left = Seq(("u1", 20L, "a")).toDF("k", "ts", "ev")
    val right = Seq(("u1", 5L, Some(1.0)), ("u1", 10L, Option.empty[Double]))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v")).collect()
    // the ts=10 row (null v) is the as-of match — NOT the older non-null one
    assert(out.head.getAs[Any]("asof_v") == null)
    assert(out.head.getAs[Long]("asof_ts") == 10L)
  }
}
