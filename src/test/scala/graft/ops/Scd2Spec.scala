package graft.ops

import graft.SharedSpark
import graft.cdc.{CdcApply, Dedup}
import graft.operators.Scd2
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite with SharedSpark {

  // (key, seq, op, payload, arrival)
  private def changelog(rows: (Long, Long, String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "ts_us", "__op", "v", "ev")
  }

  test("intervals chain per key; delete closes without emitting") {
    val log = changelog(
      (1L, 10L, "c", "a", 1L),
      (1L, 20L, "u", "b", 2L),
      (1L, 30L, "d", "b", 3L), // closes [20,30) and emits nothing
      (2L, 15L, "c", "x", 4L)
    )
    val h = Scd2.history(log, Seq("id"), "ts_us", col("ev"))
      .select("id", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet
    assert(h == Set(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false), // closed by the delete
      (2L, "x", 15L, None, true)
    ))
  }

  test("equal-seq ties order by op priority then arrival (the dedup fold's order)") {
    val log = changelog(
      (1L, 10L, "c", "first", 1L),
      (1L, 10L, "u", "second", 2L), // same ts: u (prio 3) after c (prio 1)
      (1L, 10L, "u", "third", 3L)   // full tie with `second` → later arrival wins
    )
    val h = Scd2.history(log, Seq("id"), "ts_us", col("ev"))
    val current = h.filter(col("is_current")).select("v").collect().map(_.getString(0)).toSeq
    assert(current == Seq("third"))
    assert(h.count() == 3)
  }

  test("current rows agree with the upsert fold on a random changelog") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ops = Array("c", "u", "u", "d", "r")
    val log = (1 to 400).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong * 10, ops(rnd.nextInt(ops.length)),
        s"v$i", i.toLong)
    }.toDF("id", "ts_us", "__op", "v", "ev")
      .withColumn(Dedup.ArrivalCol, col("ev"))

    val scd2Current = Scd2.history(log.drop(Dedup.ArrivalCol), Seq("id"), "ts_us", col("ev"))
      .filter(col("is_current"))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val target = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      log.drop(Dedup.ArrivalCol).schema)
    val upserted = CdcApply.upsert(target, log, Seq("id"),
      CdcApply.UpsertConfig(keepDeletes = false, dedupColumn = "ts_us"))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(scd2Current == upserted)
  }

  test("null op is not a delete: the row still opens an interval") {
    val log = changelog((1L, 10L, "c", "a", 1L))
      .union(changelog((1L, 20L, "c", "b", 2L)).withColumn("__op",
        org.apache.spark.sql.functions.lit(null: String)))
    val h = Scd2.history(log, Seq("id"), "ts_us", col("ev"))
    assert(h.count() == 2)
    assert(h.filter(col("is_current")).select("v").collect().map(_.getString(0)).toSeq == Seq("b"))
  }
}
