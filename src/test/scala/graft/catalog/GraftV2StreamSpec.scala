package graft.catalog

import java.nio.file.Files

import graft.SharedSpark
import graft.cdc.CdcApply
import graft.tables.ManagedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.readStream.table("<cat>.t")` — the V2 append-only table stream:
  * MoR-resolved seed, manifest-planned increments, admission control,
  * and the refusal edges (non-append commits, barriers, mid-stream
  * widen).
  */
class GraftV2StreamSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def registerCatalog(wh: String): String = {
    val cat = s"gvs_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("__op", StringType),
    StructField("__source_ts_ns", LongType)))

  private def rows(t: (Int, String, String, Long)*) =
    t.toSeq.toDF("id", "name", "__op", "__source_ts_ns")

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  private def drainToParquet(table: String, out: String, ck: String,
                             opts: Map[String, String] = Map.empty): Unit = {
    val r0 = spark.readStream.options(opts).table(table)
    assert(r0.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000), "drain timed out")
  }

  private def offsetBatches(ck: String): Int =
    new java.io.File(s"$ck/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))

  test("V2 table stream: MoR-resolved seed, incremental appends, restart resumes") {
    val wh = Files.createTempDirectory("graft-v2s1").toString
    val cat = registerCatalog(wh)
    val t = ManagedTable.create(spark, wh, "s1", schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.merge(rows((1, "a", "c", 1L), (2, "b", "c", 1L), (3, "c", "c", 1L)))
    t.merge(rows((2, "b2", "u", 2L), (4, "d", "c", 2L))) // MoR trickle in the seed
    val out = Files.createTempDirectory("graft-v2s1-out").toString
    val ck = Files.createTempDirectory("graft-v2s1-ck").toString
    drainToParquet(s"$cat.s1", out, ck)
    // the seed is the NET snapshot: (2 -> b2), not raw history
    def seen(): Set[(Int, String)] = spark.read.parquet(out)
      .select("id", "name").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(seen() == Set((1, "a"), (2, "b2"), (3, "c"), (4, "d")))

    // two append commits land; a restart from the SAME checkpoint serves
    // exactly them — no duplicated seed
    t.append(rows((5, "e", "c", 3L)))
    t.append(rows((6, "f", "c", 3L)))
    drainToParquet(s"$cat.s1", out, ck)
    assert(seen() == Set((1, "a"), (2, "b2"), (3, "c"), (4, "d"), (5, "e"), (6, "f")))
  }

  test("V2 table stream: maxVersionsPerTrigger and maxRowsPerTrigger split bursts") {
    val wh = Files.createTempDirectory("graft-v2s2").toString
    val cat = registerCatalog(wh)
    val t = ManagedTable.create(spark, wh, "s2", schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.append(rows((0, "seed", "c", 1L)))
    val out = Files.createTempDirectory("graft-v2s2-out").toString
    val ck = Files.createTempDirectory("graft-v2s2-ck").toString
    drainToParquet(s"$cat.s2", out, ck) // seed batch
    val seedBatches = offsetBatches(ck)

    (1 to 4).foreach(i => t.append(rows((i, s"n$i", "c", 2L))))
    drainToParquet(s"$cat.s2", out, ck, Map("maxVersionsPerTrigger" -> "1"))
    val afterVersions = offsetBatches(ck)
    assert(afterVersions - seedBatches >= 4,
      s"4 commits at cap 1 need >= 4 batches, got ${afterVersions - seedBatches}")

    // rows budget: three 5-row commits at budget 10 → at least 2 batches
    (1 to 3).foreach(b => t.append(rows(
      (100 * b until 100 * b + 5).map(i => (i, s"r$i", "c", 3L)): _*)))
    drainToParquet(s"$cat.s2", out, ck, Map("maxRowsPerTrigger" -> "10"))
    assert(offsetBatches(ck) - afterVersions >= 2,
      "three 5-row commits at budget 10 must split")
    assert(spark.read.parquet(out).count() ==
      ManagedTable.load(spark, wh, "s2").get.read().count(), "no rows lost or duplicated")
  }

  test("V2 table stream: startingVersion / startingTimestamp attach points") {
    val wh = Files.createTempDirectory("graft-v2s6").toString
    val cat = registerCatalog(wh)
    val t = ManagedTable.create(spark, wh, "s6", schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.append(rows((1, "a", "c", 1L))) // v1
    t.append(rows((2, "b", "c", 2L))) // v2
    t.append(rows((3, "c", "c", 3L))) // v3

    // explicit version: serve v2 onward, NO snapshot seed
    val out = Files.createTempDirectory("graft-v2s6-out").toString
    val ck = Files.createTempDirectory("graft-v2s6-ck").toString
    drainToParquet(s"$cat.s6", out, ck, Map("startingVersion" -> "2"))
    assert(spark.read.parquet(out).collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))

    // latest: nothing at attach; the pin survives a stop — commits landing
    // between drains are SERVED, not skipped by a re-resolved "latest"
    val out2 = Files.createTempDirectory("graft-v2s6-out2").toString
    val ck2 = Files.createTempDirectory("graft-v2s6-ck2").toString
    val r0 = spark.readStream.option("startingVersion", "latest").table(s"$cat.s6")
    assert(r0.writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start().awaitTermination(120000))
    def parquetFiles(dir: String): Int = {
      val fs = new java.io.File(dir).listFiles()
      if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
    }
    assert(parquetFiles(out2) == 0 || spark.read.parquet(out2).isEmpty,
      "latest attach serves nothing at first")
    t.append(rows((4, "d", "c", 4L)))
    drainToParquet(s"$cat.s6", out2, ck2, Map("startingVersion" -> "latest"))
    assert(spark.read.parquet(out2).collect().map(_.getInt(0)).toSeq == Seq(4),
      "commits after the pinned attach must be served on restart")

    // timestamp predating the table: full snapshot seed
    val out3 = Files.createTempDirectory("graft-v2s6-out3").toString
    val ck3 = Files.createTempDirectory("graft-v2s6-ck3").toString
    drainToParquet(s"$cat.s6", out3, ck3, Map("startingTimestamp" -> "100"))
    assert(spark.read.parquet(out3).count() == 4, "pre-creation timestamp seeds the snapshot")

    // malformed options refuse precisely — never silently mean "latest"
    for (bad <- Seq("v3", "", "0", "-1", "three"))
      assert(msgs(intercept[Exception](
        drainToParquet(s"$cat.s6",
          Files.createTempDirectory("graft-v2s6-bad").toString,
          Files.createTempDirectory("graft-v2s6-badck").toString,
          Map("startingVersion" -> bad))))
        .exists(_.contains("'latest' or a version >= 1")), s"value '$bad'")
    assert(msgs(intercept[Exception](
      drainToParquet(s"$cat.s6",
        Files.createTempDirectory("graft-v2s6-both").toString,
        Files.createTempDirectory("graft-v2s6-bothck").toString,
        Map("startingVersion" -> "2", "startingTimestamp" -> "100"))))
      .exists(_.contains("not both")))

    // behind-barrier attach fails AT ATTACH with reseed guidance — for
    // EVERY explicit version, startingVersion=1 (resolved offset 0) included
    t.overwrite(rows((9, "z", "c", 5L)))
    for (sv <- Seq("2", "1")) {
      val e = intercept[Exception](
        drainToParquet(s"$cat.s6",
          Files.createTempDirectory("graft-v2s6-out4").toString,
          Files.createTempDirectory("graft-v2s6-ck4").toString,
          Map("startingVersion" -> sv)))
      assert(msgs(e).exists(_.contains("barrier")), s"sv=$sv: ${msgs(e).mkString(" | ")}")
    }
  }

  test("V2 table stream: non-append commits, barriers, and widen fail precisely") {
    val wh = Files.createTempDirectory("graft-v2s3").toString
    val cat = registerCatalog(wh)

    // upsert commit in the range → points at the changelog source
    val t = ManagedTable.create(spark, wh, "s3", schema, Seq("id"))
    t.append(rows((1, "a", "c", 1L)))
    val out = Files.createTempDirectory("graft-v2s3-out").toString
    val ck = Files.createTempDirectory("graft-v2s3-ck").toString
    drainToParquet(s"$cat.s3", out, ck)
    t.merge(rows((1, "a2", "u", 2L)), CdcApply.UpsertConfig(keepDeletes = false))
    val e1 = intercept[Exception](drainToParquet(s"$cat.s3", out, ck))
    assert(msgs(e1).exists(_.contains("APPEND-ONLY")), msgs(e1).mkString(" | "))

    // barrier (overwrite) → reseed guidance
    val tb = ManagedTable.create(spark, wh, "s4", schema, Seq("id"))
    tb.append(rows((1, "a", "c", 1L)))
    val out2 = Files.createTempDirectory("graft-v2s4-out").toString
    val ck2 = Files.createTempDirectory("graft-v2s4-ck").toString
    drainToParquet(s"$cat.s4", out2, ck2)
    tb.overwrite(rows((9, "z", "c", 2L)))
    val e2 = intercept[Exception](drainToParquet(s"$cat.s4", out2, ck2))
    assert(msgs(e2).exists(_.contains("barrier")), msgs(e2).mkString(" | "))

    // widen mid-stream → restart guidance; a restart picks up the column
    val tw = ManagedTable.create(spark, wh, "s5", schema, Seq("id"))
    tw.append(rows((1, "a", "c", 1L)))
    val ck3 = Files.createTempDirectory("graft-v2s5-ck").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Option[Int])]()
    def drainFb(): Unit = assert(spark.readStream.table(s"$cat.s5")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach { r =>
          val extra = if (b.columns.contains("extra") && !r.isNullAt(r.fieldIndex("extra")))
            Some(r.getInt(r.fieldIndex("extra"))) else None
          seen.add((r.getInt(r.fieldIndex("id")), extra))
        }
        ()
      }
      .option("checkpointLocation", ck3)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000), "drain timed out")
    drainFb()
    // the widen hazard needs a LONG-LIVED follower (one query across the
    // evolve) — a fresh AvailableNow drain re-attaches with the new
    // schema and never sees it
    val q = spark.readStream.table(s"$cat.s5")
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach { r =>
          val extra = if (b.columns.contains("extra") && !r.isNullAt(r.fieldIndex("extra")))
            Some(r.getInt(r.fieldIndex("extra"))) else None
          seen.add((r.getInt(r.fieldIndex("id")), extra))
        }
        ()
      }
      .option("checkpointLocation", ck3)
      .start()
    val e3 = try {
      q.processAllAvailable()
      tw.addColumn(StructField("extra", IntegerType))
      tw.append(Seq((2, "b", "c", 2L, 7)).toDF("id", "name", "__op", "__source_ts_ns", "extra"))
      intercept[Exception](q.processAllAvailable())
    } finally q.stop()
    assert(msgs(e3).exists(_.contains("restart the")), msgs(e3).mkString(" | "))
    drainFb() // re-attach with the widened schema from the SAME checkpoint
    assert(seen.toArray.toSet == Set((1, None), (2, Some(7))),
      s"widen restart must serve the new column, got ${seen.toArray.toSet}")

    // a time-traveled handle refuses to stream
    val e4 = intercept[Exception] {
      new GraftV2Table(tb, Some("1"))
        .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build().toMicroBatchStream("/tmp/unused")
    }
    assert(msgs(e4).exists(_.contains("time-traveled")), msgs(e4).mkString(" | "))
  }
}
