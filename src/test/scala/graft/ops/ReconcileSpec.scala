package graft.ops

import graft.SharedSpark
import graft.operators.Reconcile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReconcileSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def statuses(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(r.length - 1))).toSet

  test("classifies missing/extra/mismatch; equal rows absent") {
    val source = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "qty")
    val target = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40))
      .toDF("id", "name", "qty")
    val d = Reconcile.diff(source, target, Seq("id"))
    assert(statuses(d) == Set(
      (2L, "mismatch"),           // name differs
      (3L, "missing_in_target"),
      (4L, "extra_in_target")))   // id=1 equal -> absent
  }

  test("null-safe comparison: null == null is a match, null vs value is not") {
    val source = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "name")
    val target = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "name")
    val d = Reconcile.diff(source, target, Seq("id"))
    assert(statuses(d) == Set((2L, "mismatch")))
  }

  test("explicit compare columns ignore the rest") {
    val source = Seq((1L, "a", 99)).toDF("id", "name", "noise")
    val target = Seq((1L, "a", -1)).toDF("id", "name", "noise")
    assert(Reconcile.diff(source, target, Seq("id"), Seq("name")).isEmpty)
    assert(statuses(Reconcile.diff(source, target, Seq("id"), Seq("noise"))) ==
      Set((1L, "mismatch")))
  }

  test("key-only relations reconcile on presence") {
    val source = Seq(1L, 2L).toDF("id")
    val target = Seq(2L, 3L).toDF("id")
    assert(statuses(Reconcile.diff(source, target, Seq("id"))) ==
      Set((1L, "missing_in_target"), (3L, "extra_in_target")))
  }

  test("composite keys and column validation") {
    val source = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("a", "b", "v")
    val target = Seq((1L, "x", 1.0), (1L, "y", 9.0)).toDF("a", "b", "v")
    val d = Reconcile.diff(source, target, Seq("a", "b"))
    assert(d.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "y", "mismatch")))
    // default compare set shrinks to the shared columns ("name" only here);
    // asking explicitly for the absent column is the error
    assert(Reconcile.diff(source, target.drop("v"), Seq("a", "b")).isEmpty)
    intercept[IllegalArgumentException] {
      Reconcile.diff(source, target.drop("v"), Seq("a", "b"), Seq("v"))
    }
  }

  test("a healthy replica diffs to empty") {
    val t = spark.range(0, 10000)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        (col("id") % 7).cast("double").as("v"))
    assert(Reconcile.diff(t, t, Seq("id")).isEmpty)
  }

  test("duplicate keys compare as multisets, not a fanned-out join") {
    // same key twice with the same payloads in a different physical order:
    // equal; a cardinality drift (one side has an extra copy): mismatch,
    // reported ONCE per key, never as a 2x2 join fan-out
    val source = Seq((1L, "a"), (1L, "b"), (2L, "x"), (2L, "x")).toDF("id", "name")
    val eq = Seq((1L, "b"), (1L, "a"), (2L, "x"), (2L, "x")).toDF("id", "name")
    assert(Reconcile.diff(source, eq, Seq("id")).isEmpty)
    val drift = Seq((1L, "a"), (1L, "b"), (2L, "x")).toDF("id", "name")
    assert(statuses(Reconcile.diff(source, drift, Seq("id"))) ==
      Set((2L, "mismatch")))
  }

  test("null key values reconcile as one key instead of missing+extra") {
    val source = Seq((Option.empty[java.lang.Long], "a"), (Some(1L: java.lang.Long), "b"))
      .toDF("id", "name")
    val same = Seq((Option.empty[java.lang.Long], "a"), (Some(1L: java.lang.Long), "b"))
      .toDF("id", "name")
    assert(Reconcile.diff(source, same, Seq("id")).isEmpty)
    val changed = Seq((Option.empty[java.lang.Long], "A"), (Some(1L: java.lang.Long), "b"))
      .toDF("id", "name")
    val d = Reconcile.diff(source, changed, Seq("id")).collect()
    assert(d.length == 1 && d.head.isNullAt(0) && d.head.getString(1) == "mismatch")
  }

  test("repair converges a drifted replica: post-repair diff is empty") {
    val wh = java.nio.file.Files.createTempDirectory("graft-repair").toString
    val source = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (5L, "e", 50))
      .toDF("id", "name", "qty")
    // replica drifted: 2 mismatched, 3 missing, 4 extra
    val drifted = Seq((1L, "a", 10), (2L, "B", 99), (4L, "d", 40))
      .toDF("id", "name", "qty")
    val t = graft.tables.ManagedTable.create(spark, wh, "replica",
      source.schema, Seq("id"))
    t.append(drifted)
    val (up, del) = Reconcile.repair(t, source)
    assert(up == 3L && del == 1L, s"counts: up=$up del=$del") // 2,3,5 upsert; 4 deleted
    assert(Reconcile.diff(source, t.read(), Seq("id")).isEmpty, "replica still drifted")
    val rows = t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (5L, "e", 50)))
    // healthy replica: repair is a no-op and burns no snapshot version
    val v = t.meta.currentVersion
    assert(Reconcile.repair(t, source) == ((0L, 0L)))
    assert(t.meta.currentVersion == v)
  }
}
