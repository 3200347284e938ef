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

  test("snapshotAt reconstructs the state at each instant of a known timeline") {
    import org.apache.spark.sql.functions.lit
    val log = changelog(
      (1L, 10L, "c", "a", 1L),
      (1L, 20L, "u", "b", 2L),
      (1L, 30L, "d", "b", 3L),
      (1L, 40L, "c", "c", 4L), // re-insert after delete
      (2L, 15L, "c", "x", 5L)
    )
    def snap(t: Long) = Scd2.snapshotAt(log, Seq("id"), "ts_us", col("ev"), lit(t))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(snap(5L) == Set.empty)                         // before everything
    assert(snap(10L) == Set((1L, "a")))                   // first insert visible
    assert(snap(25L) == Set((1L, "b"), (2L, "x")))        // after update
    assert(snap(35L) == Set((2L, "x")))                   // key 1 deleted
    assert(snap(99L) == Set((1L, "c"), (2L, "x")))        // re-inserted
  }

  test("snapshotAt agrees with history's interval containment on a random changelog") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val rnd = new scala.util.Random(11)
    val ops = Array("c", "u", "u", "d", "r")
    val log = (1 to 400).map { i =>
      (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong * 10, ops(rnd.nextInt(ops.length)),
        s"v$i", i.toLong)
    }.toDF("id", "ts_us", "__op", "v", "ev")
    for (t <- Seq(0L, 120L, 250L, 490L)) {
      val viaSnapshot = Scd2.snapshotAt(log, Seq("id"), "ts_us", col("ev"), lit(t))
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // history equivalent: the interval containing t — last-opened at or
      // before t that is still open or closes after t. Because intervals
      // chain on the same (seq, prio, arrival) order, that is exactly
      // valid_from <= t < coalesce(valid_to, ∞)... except equal-seq tie
      // groups, where only the LAST row of the tie group is the state (the
      // earlier tie rows have valid_from = valid_to = t, an empty interval).
      val viaHistory = Scd2.history(log, Seq("id"), "ts_us", col("ev"))
        .filter(col("valid_from") <= t &&
          (col("valid_to").isNull || col("valid_to") > t))
        .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(viaSnapshot == viaHistory, s"asOf=$t")
    }
  }

  test("incremental materialization: batch replay ≡ full-log rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val rnd = new scala.util.Random(17)
    val ops = Array("c", "u", "u", "d", "r")
    val log = (1 to 600).map { i =>
      (rnd.nextInt(50).toLong, rnd.nextInt(100).toLong * 10, ops(rnd.nextInt(ops.length)),
        s"v$i", i.toLong)
    }.toDF("id", "ts_us", "__op", "v", "ev")
    // per-key seq must not regress across batches: split by seq ranges
    val cutsAt = Seq(0L, 300L, 700L, 1001L)
    val batches = cutsAt.sliding(2).map { case Seq(lo, hi) =>
      log.where(col("ts_us") >= lo && col("ts_us") < hi)
    }.toSeq
    val wh = java.nio.file.Files.createTempDirectory("graft_scd2m").toString

    val table = Scd2.materialize(spark, wh, "hist", batches.head,
      Seq("id"), "ts_us", "ev")
    batches.tail.foreach(b => Scd2.applyBatch(table, b, Seq("id"), "ts_us", "ev"))

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "v", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSet

    val incremental = canon(table.read())
    val rebuild = canon(Scd2.history(log, Seq("id"), "ts_us", col("ev")))
    assert(incremental == rebuild,
      s"extra=${(incremental -- rebuild).take(5)} missing=${(rebuild -- incremental).take(5)}")
    // and the maintained table's current rows equal the upsert fold
    val current = table.read().filter(col("is_current"))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val folded = Scd2.snapshotAt(log, Seq("id"), "ts_us", col("ev"), lit(Long.MaxValue))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(current == folded)
  }

  test("materialization works with a non-default op column") {
    // regression: applyBatch must forward opCol into the table merge —
    // with the default left in place the merge's internal dedup would
    // reference a nonexistent "__op" column and fail analysis
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_scd2op").toString
    val b1 = Seq((1L, 10L, "c", "a", 1L), (2L, 10L, "c", "x", 2L))
      .toDF("id", "ts_us", "operation", "v", "ev")
    val b2 = Seq((1L, 20L, "u", "b", 3L), (2L, 20L, "d", "x", 4L))
      .toDF("id", "ts_us", "operation", "v", "ev")
    val table = Scd2.materialize(spark, wh, "hist_op", b1,
      Seq("id"), "ts_us", "ev", opCol = "operation")
    Scd2.applyBatch(table, b2, Seq("id"), "ts_us", "ev", opCol = "operation")
    val current = table.read().filter(col("is_current"))
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(current == Set((1L, "b"))) // key 2 deleted: no current row
  }

  test("null op is not a delete: the row still opens an interval") {
    val log = changelog((1L, 10L, "c", "a", 1L))
      .union(changelog((1L, 20L, "c", "b", 2L)).withColumn("__op",
        org.apache.spark.sql.functions.lit(null: String)))
    val h = Scd2.history(log, Seq("id"), "ts_us", col("ev"))
    assert(h.count() == 2)
    assert(h.filter(col("is_current")).select("v").collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("enrichAsOf picks the version valid at the fact instant; deletion gaps yield nulls") {
    import spark.implicits._
    val log = changelog(
      (1L, 10L, "c", "v1", 1L),
      (1L, 20L, "u", "v2", 2L),
      (1L, 30L, "d", "v2", 3L),  // gap [30, 40)
      (1L, 40L, "c", "v3", 4L))
    val hist = Scd2.history(log, Seq("id"), "ts_us", col("ev"))
      .select(col("id"), col("v").as("dim_v"), col("valid_from"), col("valid_to"))
    val facts = Seq(
      (1L, 5L),   // before first version → null
      (1L, 10L),  // inclusive lower bound → v1
      (1L, 19L),  // still v1
      (1L, 20L),  // exclusive upper bound → v2
      (1L, 35L),  // inside the deletion gap → null
      (1L, 99L),  // open current interval → v3
      (2L, 50L)   // unknown key → null
    ).toDF("id", "fts")
    val out = Scd2.enrichAsOf(facts, hist, Seq("id"), "fts")
      .select("id", "fts", "dim_v")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out === Set(
      (1L, 5L, None), (1L, 10L, Some("v1")), (1L, 19L, Some("v1")),
      (1L, 20L, Some("v2")), (1L, 35L, None), (1L, 99L, Some("v3")),
      (2L, 50L, None)))
    // inner join drops the unmatched facts instead
    assert(Scd2.enrichAsOf(facts, hist, Seq("id"), "fts", "inner").count() === 4)
    // disjoint intervals ⇒ the join never fans a fact out
    assert(Scd2.enrichAsOf(facts, hist, Seq("id"), "fts").count() === facts.count())
  }
}
