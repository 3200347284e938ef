package graft.sources

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `format("graft-table")` V1 source ([[GraftSource]]): the no-extensions
  * read/write surface — MoR reads, ref reads, filter-driven manifest
  * pruning (superset-scan soundness), and create-on-first-write.
  */
class GraftSourceSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def wh = java.nio.file.Files.createTempDirectory("graft-src").toString

  test("read: MoR snapshot, column/filter pushdown agree with table.read()") {
    val w = wh
    val df = (1 to 200).map(i => (i.toLong, i % 10, s"n$i")).toDF("id", "grp", "name")
    val t = ManagedTable.create(spark, w, "t1", df.schema, Seq("id"), Seq("grp"))
    t.append(df)
    t.deleteWhere(col("id") > 180L) // MoR tombstones must apply
    val viaSource = spark.read.format("graft-table")
      .option("warehouse", w).option("table", "t1").load()
    assert(viaSource.count() == 180)
    assert(viaSource.schema == t.read().schema)
    // filter + projection: same rows as the table API
    val got = viaSource.filter(col("grp") === 3).select("id").as[Long].collect().toSet
    val want = t.read().filter(col("grp") === 3).select("id").as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
    // range filter (manifest bounds prune path) still exact
    assert(viaSource.filter(col("id") >= 50L && col("id") <= 60L).count() ==
      t.read().filter(col("id").between(50L, 60L)).count())
    // partition-source single-sided range (tuple pruning path)
    assert(viaSource.filter(col("grp") >= 8).count() ==
      t.read().filter(col("grp") >= 8).count())
    // session-conf warehouse fallback
    spark.conf.set("spark.graft.warehouse", w)
    try assert(spark.read.format("graft-table").option("table", "t1").load().count() == 180)
    finally spark.conf.unset("spark.graft.warehouse")
  }

  test("read: versionAsOf resolves snapshot numbers, tags and branches") {
    val w = wh
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "t2", df.schema, Seq("id"))
    t.append(df)
    val v1 = t.meta.currentVersion
    t.tag("pinned")
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.stageAppend(Seq((9L, "staged")).toDF("id", "v"), "audit")
    def rd(ref: String) = spark.read.format("graft-table")
      .option("warehouse", w).option("table", "t2").option("versionAsOf", ref).load()
    assert(rd(v1.toString).count() == 2)
    assert(rd("pinned").count() == 2)
    assert(rd("audit").count() == 4)
    val e = intercept[Exception] { rd("nope").count() }
    assert(e.getMessage.contains("unknown version ref"), e.getMessage)
  }

  test("write: append, overwrite, create-on-first-write with ids and partitioning") {
    val w = wh
    val df = (1 to 50).map(i => (i.toLong, i % 5, s"n$i")).toDF("id", "grp", "name")
    df.write.format("graft-table").option("warehouse", w).option("table", "t3")
      .option("identifier-fields", "id").option("partition-by", "grp")
      .mode(SaveMode.Append).save()
    val t = ManagedTable.load(spark, w, "t3").get
    assert(t.meta.identifierFields == Seq("id"))
    assert(t.meta.partitionBy == Seq("grp"))
    assert(t.read().count() == 50)
    // append again through the source
    Seq((100L, 1, "x")).toDF("id", "grp", "name").write.format("graft-table")
      .option("warehouse", w).option("table", "t3").mode(SaveMode.Append).save()
    assert(ManagedTable.load(spark, w, "t3").get.read().count() == 51)
    // overwrite replaces the content
    Seq((7L, 2, "only")).toDF("id", "grp", "name").write.format("graft-table")
      .option("warehouse", w).option("table", "t3").mode(SaveMode.Overwrite).save()
    assert(ManagedTable.load(spark, w, "t3").get.read().count() == 1)
    // ErrorIfExists refuses, Ignore no-ops
    val e = intercept[Exception] {
      df.write.format("graft-table").option("warehouse", w).option("table", "t3")
        .mode(SaveMode.ErrorIfExists).save()
    }
    assert(e.getMessage.contains("already exists"), e.getMessage)
    df.write.format("graft-table").option("warehouse", w).option("table", "t3")
      .mode(SaveMode.Ignore).save()
    assert(ManagedTable.load(spark, w, "t3").get.read().count() == 1)
    // user schemas are refused (committed schema is authoritative)
    val e2 = intercept[Exception] {
      spark.read.format("graft-table").schema(df.schema)
        .option("warehouse", w).option("table", "t3").load()
    }
    assert(e2.getMessage.contains("authoritative"), e2.getMessage)
  }

  test("changelog streaming source: version offsets, restart resume, barrier refusal") {
    val w = wh
    val out = java.nio.file.Files.createTempDirectory("graft-chg-out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-chg-ck").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "chg", df.schema, Seq("id"))
    t.append(df)
    t.updateWhere(col("id") === 1L, Map("v" -> lit("a2")))
    def runOnce(): Unit = assert(spark.readStream.format("graft-table")
      .option("warehouse", w).option("table", "chg").load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000), "drain timed out")
    runOnce()
    val got1 = spark.read.parquet(out)
    assert(got1.columns.contains(ManagedTable.SeqCol) &&
      got1.columns.contains(ManagedTable.TombstoneCol))
    // seed batch = the net current state (2 live keys; the update's net row)
    assert(got1.count() >= 2)
    assert(got1.filter(col("id") === 1L && col("v") === "a2").count() >= 1)
    // restart from the checkpoint: only the NEW commits arrive
    val before = got1.count()
    ManagedTable.load(spark, w, "chg").get.deleteWhere(col("id") === 2L)
    runOnce()
    val got2 = spark.read.parquet(out)
    assert(got2.count() > before)
    assert(got2.filter(col("id") === 2L &&
      col(ManagedTable.TombstoneCol)).count() >= 1,
      "the hard delete must arrive as a tombstone change row")
    // a barrier inside the next range fails precisely
    ManagedTable.load(spark, w, "chg").get.overwrite(Seq((9L, "z")).toDF("id", "v"))
    val e = intercept[Exception] { runOnce() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("changelog barrier")), msgs(e).mkString(" | "))
  }

  test("changelog source retention fallback: incremental ranges recover, expired seed fails") {
    import org.apache.spark.sql.execution.streaming.runtime.LongOffset
    val w = wh
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "rf", df.schema, Seq("id")) // retention default: 1
    t.append(df)                                   // v1
    t.append(Seq((2L, "b")).toDF("id", "v"))       // v2
    t.append(Seq((3L, "c")).toDF("id", "v"))       // v3
    t.append(Seq((4L, "d")).toDF("id", "v"))       // v4 — v2's manifest expires
    assert(!t.manifestRetained(2L) && t.manifestRetained(4L))
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(ManagedTable.SeqCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(ManagedTable.TombstoneCol,
        org.apache.spark.sql.types.BooleanType, nullable = false)))
    val src = new GraftStreamSource(spark, w, "rf", schema)
    // fallback CONTENT: the current-manifest view of an expired range is
    // exactly the range's rows on this append-only history
    assert(t.readChangesBetweenCurrent(1L, 2L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(2L))
    assert(t.readChangesBetweenCurrent(0L, 2L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // and readChangesBetween itself still refuses the expired manifest
    intercept[IllegalArgumentException] { t.readChangesBetween(1L, 2L) }
    // the SOURCE takes the fallback for both incremental and seed
    // re-requests without throwing (content execution rides the engine —
    // the mirror differential's restarts cover it e2e)
    val inc = src.getBatch(Some(LongOffset(1L)), LongOffset(2L))
    val seed = src.getBatch(None, LongOffset(2L))
    assert(inc.isStreaming && seed.isStreaming)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(inc.schema) == shape(schema) && shape(seed.schema) == shape(schema))
  }

  test("randomized mirror differential: source→sink streamed replication ≡ upstream") {
    val rnd = new scala.util.Random(97)
    val w = wh
    val ck = java.nio.file.Files.createTempDirectory("graft-mirror-ck").toString
    val df0 = Seq((0L, "seed", 0L)).toDF("id", "v", "n")
    val up = ManagedTable.create(spark, w, "mup", df0.schema, Seq("id"))
    up.append(df0)
    var nextId = 1L
    def randomOps(): Unit = (1 to 1 + rnd.nextInt(3)).foreach { _ =>
      val t = ManagedTable.load(spark, w, "mup").get
      rnd.nextInt(3) match {
        case 0 =>
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            nextId += 1; (nextId, s"v$nextId", rnd.nextInt(100).toLong)
          }
          t.append(rows.toDF("id", "v", "n"))
        case 1 =>
          t.updateWhere(col("id") % 3 === rnd.nextInt(3) && col("id") <= nextId,
            Map("v" -> concat(lit("u"), col("id")), "n" -> (col("n") + 1L)))
        case 2 =>
          t.deleteWhere(col("id") === (rnd.nextInt(nextId.toInt + 1).toLong))
      }
    }
    def drain(): Unit = spark.readStream.format("graft-table")
      .option("warehouse", w).option("table", "mup").load()
      // reserved meta names cannot be table columns downstream — rename
      .select(col("id"), col("v"), col("n"),
        col(ManagedTable.SeqCol).as("src_seq"),
        col(ManagedTable.TombstoneCol).as("src_del"))
      .writeStream.format("graft-table")
      .option("warehouse", w).option("table", "mmirror")
      .option("identifier-fields", "id").option("mode", "upsert")
      .option("tombstone-column", "src_del")
      .option("dedup-column", "src_seq")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000)
    def state(name: String): Set[(Long, String, Long)] =
      ManagedTable.load(spark, w, name).get.read()
        .select("id", "v", "n").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    (1 to 6).foreach { round =>
      randomOps()
      drain()
      // the mirror carries the change-meta columns as data; compare the
      // logical columns
      assert(state("mmirror") == state("mup"), s"mirror diverged at round $round")
    }
  }

  test("streaming sink: writeStream.format(graft) appends exactly-once; upsert mode nets per key") {
    val w = wh
    val in = java.nio.file.Files.createTempDirectory("graft-sink-in").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sink-ck").toString
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("id", "v").repartition(1).write.mode("overwrite")
        .json(s"$in/$name")
    drop("b1", Seq((1L, "a"), (2L, "b")))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    def runOnce(): Unit = spark.readStream.schema(schema).json(s"$in/*")
      .writeStream.format("graft-table")
      .option("warehouse", w).option("table", "sunk")
      .option("identifier-fields", "id").option("mode", "upsert")
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000)
    runOnce()
    val t = ManagedTable.load(spark, w, "sunk").get
    assert(t.meta.identifierFields == Seq("id"))
    assert(t.read().count() == 2)
    // upsert: second batch replaces key 1, adds key 3
    drop("b2", Seq((1L, "a2"), (3L, "c")))
    runOnce()
    val got = ManagedTable.load(spark, w, "sunk").get.read()
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a2"), (2L, "b"), (3L, "c")), got.toString)
    // a clean re-run on the SAME checkpoint finds nothing new: no-op
    runOnce()
    assert(ManagedTable.load(spark, w, "sunk").get.read().count() == 3)
    // a WIPED checkpoint restarts batch ids below the marker — silently
    // skipping would drop any NEW files mixed into the restarted batch,
    // so the sink fails precisely instead
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ck))
    val e3 = intercept[Exception] { runOnce() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e3).exists(_.contains("wiped or relocated")), msgs(e3).mkString(" | "))
    // duplicate keys within ONE batch net to a single row (dedup-column
    // makes it deterministic last-wins)
    val w2 = wh
    val in2 = java.nio.file.Files.createTempDirectory("graft-sink-in2").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft-sink-ck2").toString
    Seq((1L, "old", 1L), (1L, "new", 2L), (2L, "b", 1L)).toDF("id", "v", "ts")
      .repartition(1).write.json(s"$in2/b1")
    val schema2 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType)))
    spark.readStream.schema(schema2).json(s"$in2/*")
      .writeStream.format("graft-table")
      .option("warehouse", w2).option("table", "sunk2")
      .option("identifier-fields", "id").option("mode", "upsert")
      .option("dedup-column", "ts")
      .option("checkpointLocation", ck2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination(120000)
    val s2 = ManagedTable.load(spark, w2, "sunk2").get.read()
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s2 == Set((1L, "new"), (2L, "b")), s2.toString)
    // upsert without ids anywhere is refused BEFORE any table is created
    val e4 = intercept[Exception] {
      spark.readStream.schema(schema2).json(s"$in2/*")
        .writeStream.format("graft-table")
        .option("warehouse", w2).option("table", "sunk3").option("mode", "upsert")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ck3").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination(120000)
    }
    assert(msgs(e4).exists(_.contains("identifier-fields")), msgs(e4).mkString(" | "))
    assert(ManagedTable.load(spark, w2, "sunk3").isEmpty,
      "a refused upsert stream must not leave a keyless table behind")
  }
}
