package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** [[MaterializedView]] — persisted incremental aggregate maintenance:
  * after every refresh the summary table must equal a full re-aggregation
  * of the source's current state, across inserts, updates (including
  * group-moving ones), hard deletes that empty whole groups, empty
  * refreshes, and a reload.
  */
class MaterializedViewSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val ops = Vector("c", "u", "u", "u", "d")

  private def randomBatch(rnd: Random, n: Int): DataFrame =
    List.fill(n)((rnd.nextInt(40), s"g${rnd.nextInt(5)}", rnd.nextInt(100).toLong,
      ops(rnd.nextInt(5)), rnd.nextInt(5).toLong))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns")

  private def canonAgg(df: DataFrame): Seq[(String, Long, Long)] =
    df.select(col("grp"), col("sum_v").cast("long"), col("n_rows")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq

  private def expected(t: ManagedTable): Seq[(String, Long, Long)] =
    canonAgg(t.read().groupBy("grp")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows")))

  test("refresh ≡ full recompute over random CDC batches; exactly-once marker") {
    val rnd = new Random(11)
    val wh = java.nio.file.Files.createTempDirectory("graft-mv").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val schema = randomBatch(rnd, 1).schema
    val src = ManagedTable.create(spark, wh, "facts", schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(randomBatch(rnd, 30), cfg)
    val mv = MaterializedView.create(spark, wh, "facts_by_grp", src,
      Seq("grp"), Seq("v"))
    assert(canonAgg(mv.read()) == expected(src), "seed aggregate wrong")
    assert(mv.refreshedVersion == src.meta.currentVersion)

    for (i <- 1 to 5) {
      src.merge(randomBatch(rnd, 25), cfg)
      if (i % 2 == 0) src.merge(randomBatch(rnd, 25), cfg) // multi-commit lag
      mv.refresh()
      assert(canonAgg(mv.read()) == expected(src), s"diverged after refresh $i")
      assert(mv.refreshedVersion == src.meta.currentVersion)
    }

    // no-change refresh: summary version must not burn a snapshot
    val sumV = mv.summary.meta.currentVersion
    mv.refresh()
    assert(mv.summary.meta.currentVersion == sumV, "no-op refresh burned a version")

    // reload path reconstructs the definition from properties
    val re = MaterializedView.load(spark, wh, "facts_by_grp", src).get
    assert(canonAgg(re.read()) == expected(src))
    assert(re.refreshedVersion == src.meta.currentVersion)
  }

  test("a keyed metadata region delete is a barrier: the MV reseeds to the recompute") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mvk").toString
    val df = (1 to 60).map(i => (i, s"g${i % 3}", i.toLong)).toDF("id", "grp", "v")
    val src = ManagedTable.create(spark, wh, "kfacts", df.schema, Seq("id"), Seq("grp"),
      properties = Map("write.versions-retained" -> "10"))
    src.append(df)
    val mv = MaterializedView.create(spark, wh, "kfacts_by_grp", src, Seq("grp"), Seq("v"))
    assert(canonAgg(mv.read()) == expected(src))
    // pure-region keyed delete: manifest diff, no tombstones — only the
    // barrier keeps the incremental refresh from silently keeping g1
    val files = src.filesMetadata().select("path").as[String].collect().toSet
    src.deleteWhere(col("grp") === "g1")
    assert(src.filesMetadata().select("path").as[String].collect().toSet
        .subsetOf(files), "precondition: the delete took the metadata route")
    mv.refresh()
    assert(canonAgg(mv.read()) == expected(src),
      "MV diverged across a keyed metadata region delete")
    assert(!canonAgg(mv.read()).exists(_._1 == "g1"))
  }

  test("a group emptied by deletes leaves the summary; group-moving update migrates counts") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mv2").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val b0 = Seq((1, "a", 10L, "c", 0L), (2, "a", 20L, "c", 0L), (3, "b", 5L, "c", 0L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns")
    val src = ManagedTable.create(spark, wh, "f2", b0.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(b0, cfg)
    val mv = MaterializedView.create(spark, wh, "f2_by_grp", src, Seq("grp"), Seq("v"))
    assert(canonAgg(mv.read()) == Seq(("a", 30L, 2L), ("b", 5L, 1L)))

    // key 3 moves from b to a; b empties and must DROP from the summary
    src.merge(Seq((3, "a", 7L, "u", 1L)).toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    mv.refresh()
    assert(canonAgg(mv.read()) == Seq(("a", 37L, 3L)))

    // delete everything: the summary empties entirely
    src.merge(Seq((1, "a", 0L, "d", 2L), (2, "a", 0L, "d", 2L), (3, "a", 0L, "d", 2L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    mv.refresh()
    assert(mv.read().count() == 0L)
    assert(canonAgg(mv.read()) == expected(src))
  }

  test("follow() keeps the summary current across streamed source commits") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mvf").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-mvf-ck").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val b0 = Seq((1, "a", 10L, "c", 0L), (2, "b", 20L, "c", 0L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns")
    val src = ManagedTable.create(spark, wh, "ff", b0.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(b0, cfg)
    val mv = MaterializedView.create(spark, wh, "ff_by_grp", src, Seq("grp"), Seq("v"))

    src.merge(Seq((3, "a", 5L, "c", 1L), (2, "b", 0L, "d", 1L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    val q1 = mv.follow(ck)
    q1.awaitTermination(60000)
    assert(canonAgg(mv.read()) == expected(src), "follow pass 1 diverged")
    assert(mv.refreshedVersion == src.meta.currentVersion)

    // more commits, second AvailableNow pass resumes from the checkpoint
    src.merge(Seq((1, "c", 7L, "u", 2L)).toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    val q2 = mv.follow(ck)
    q2.awaitTermination(60000)
    assert(canonAgg(mv.read()) == expected(src), "follow pass 2 diverged")
  }

  test("MV over MV: a (day, month) → month rollup chain refreshes through both levels") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mvchain").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val b0 = Seq((1, "d01", "m1", 10L, "c", 0L), (2, "d02", "m1", 20L, "c", 0L),
      (3, "d03", "m2", 5L, "c", 0L))
      .toDF("id", "day", "month", "v", "__op", "__source_ts_ns")
    val src = ManagedTable.create(spark, wh, "fx", b0.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(b0, cfg)
    // level 1: per-(day, month); its summary is itself a keyed ManagedTable,
    // so level 2 stacks on top with zero new machinery
    val daily = MaterializedView.create(spark, wh, "fx_daily", src,
      Seq("day", "month"), Seq("v"))
    val monthly = MaterializedView.create(spark, wh, "fx_monthly", daily.summary,
      Seq("month"), Seq("sum_v"))
    def monthState() = monthly.read().select("month", "sum_sum_v", "n_rows")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(monthState() == Seq(("m1", 30L, 2L), ("m2", 5L, 1L)))

    // a delete that empties a day, an update, an insert into a new month
    src.merge(Seq((2, "d02", "m1", 0L, "d", 1L), (1, "d01", "m1", 15L, "u", 1L),
      (4, "d09", "m3", 9L, "c", 1L))
      .toDF("id", "day", "month", "v", "__op", "__source_ts_ns"), cfg)
    daily.refresh()
    monthly.refresh()
    assert(monthState() == Seq(("m1", 15L, 1L), ("m2", 5L, 1L), ("m3", 9L, 1L)))
    // chain equals full recompute from the base facts
    val full = src.read().groupBy("month").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(monthState().map(t => (t._1, t._2)) == full.map(t => (t._1, t._2)))
  }

  test("null sums count as zero; compact barrier and retention loss trigger reseed") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mvfix").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val b0 = Seq((1, "a", Option(10L), "c", 0L), (2, "a", Option.empty[Long], "c", 0L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns")
    val src = ManagedTable.create(spark, wh, "fnull", b0.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(b0, cfg)
    val mv = MaterializedView.create(spark, wh, "fnull_by_grp", src, Seq("grp"), Seq("v"))
    def recompute() = canonAgg(src.read().groupBy("grp")
      .agg(sum(coalesce(col("v"), lit(0))).as("sum_v"), count(lit(1)).as("n_rows")))
    assert(canonAgg(mv.read()) == recompute())
    assert(canonAgg(mv.read()) == Seq(("a", 10L, 2L))) // null counted as 0

    // an all-NULL delta for the group must not null the accumulated sum
    src.merge(Seq((3, "a", Option.empty[Long], "c", 1L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    mv.refresh()
    assert(canonAgg(mv.read()) == Seq(("a", 10L, 3L)), s"got ${canonAgg(mv.read())}")

    // deletion + full compact BETWEEN refreshes: the barrier must force a
    // reseed (the compacted changelog can no longer express the retraction)
    src.merge(Seq((1, "a", Option(10L), "d", 2L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    src.compact()
    mv.refresh()
    assert(canonAgg(mv.read()) == recompute(), "barrier reseed diverged")
    assert(canonAgg(mv.read()) == Seq(("a", 0L, 2L)))

    // retention loss: two commits beyond a 1-version window falls back
    val src2 = ManagedTable.create(spark, wh, "ret1", b0.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "1"))
    src2.merge(b0, cfg)
    val mv2 = MaterializedView.create(spark, wh, "ret1_by_grp", src2, Seq("grp"), Seq("v"))
    src2.merge(Seq((4, "b", Option(7L), "c", 1L)).toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    src2.merge(Seq((5, "b", Option(8L), "c", 2L)).toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    mv2.refresh() // from-version manifest GC'd -> reseed, not a crash
    assert(canonAgg(mv2.read()) == canonAgg(src2.read().groupBy("grp")
      .agg(sum(coalesce(col("v"), lit(0))).as("sum_v"), count(lit(1)).as("n_rows"))))
  }

  test("metadata-only source commits advance the marker without touching data") {
    val wh = java.nio.file.Files.createTempDirectory("graft-mv3").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val b0 = Seq((1, "a", 10L, "c", 0L)).toDF("id", "grp", "v", "__op", "__source_ts_ns")
    val src = ManagedTable.create(spark, wh, "f3", b0.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(b0, cfg)
    val mv = MaterializedView.create(spark, wh, "f3_by_grp", src, Seq("grp"), Seq("v"))
    // a data-free commit (rollback to the same state via re-commit):
    src.merge(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      b0.schema), cfg)
    assert(src.meta.currentVersion > mv.refreshedVersion)
    mv.refresh()
    assert(mv.refreshedVersion == src.meta.currentVersion)
    assert(canonAgg(mv.read()) == expected(src))
  }

  test("non-retractable aggregates (max/min/distinct) via per-changed-group recompute") {
    val rnd = new Random(43)
    val wh = java.nio.file.Files.createTempDirectory("graft-mv4").toString
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val schema = randomBatch(rnd, 1).schema
    val src = ManagedTable.create(spark, wh, "f4", schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    src.merge(randomBatch(rnd, 30), cfg)
    val mv = MaterializedView.create(spark, wh, "f4_by_grp", src,
      Seq("grp"), Seq("v"), maxCols = Seq("v"), minCols = Seq("v"),
      distinctCols = Seq("v"))
    def canonFull(df: DataFrame): Seq[(String, Long, Long, Long, Long, Long)] =
      df.select(col("grp"), col("sum_v").cast("long"), col("n_rows"),
        col("max_v").cast("long"), col("min_v").cast("long"), col("nd_v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    def want(): Seq[(String, Long, Long, Long, Long, Long)] =
      canonFull(src.read().groupBy("grp").agg(
        sum("v").as("sum_v"), count(lit(1)).as("n_rows"),
        max("v").as("max_v"), min("v").as("min_v"),
        count_distinct(col("v")).as("nd_v")))
    assert(canonFull(mv.read()) == want(), "seed wrong")
    for (i <- 1 to 5) {
      src.merge(randomBatch(rnd, 25), cfg) // deletes shrink maxes — the
      mv.refresh()                         // case a signed delta can't do
      assert(canonFull(mv.read()) == want(), s"diverged after refresh $i")
    }
    // the max-DECREASING path explicitly: delete the max holder of one group
    val holder = src.read().orderBy(col("grp"), col("v").desc).limit(1).collect()(0)
    src.merge(Seq((holder.getInt(0), holder.getString(1), holder.getLong(2), "d", 99L))
      .toDF("id", "grp", "v", "__op", "__source_ts_ns"), cfg)
    mv.refresh()
    assert(canonFull(mv.read()) == want(), "max not lowered after holder delete")
    // reload restores the recompute definition from properties
    val re = MaterializedView.load(spark, wh, "f4_by_grp", src).get
    assert(re.maxCols == Seq("v") && re.distinctCols == Seq("v"))
    src.merge(randomBatch(rnd, 20), cfg)
    re.refresh()
    assert(canonFull(re.read()) == want(), "reloaded view diverged")
  }
}
