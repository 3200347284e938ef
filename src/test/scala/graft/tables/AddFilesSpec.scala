package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** [[ManagedTable.addFiles]] — rewrite-free adoption of external parquet
  * files as a normal data commit (the Iceberg `add_files` migration
  * analogue).
  */
class AddFilesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpWarehouse(): String = Files.createTempDirectory("graft-wh").toString

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("__op", StringType),
    StructField("__source_ts_ns", LongType)))

  private def rows(t: (Int, String, String, Long)*) =
    t.toSeq.toDF("id", "name", "__op", "__source_ts_ns")

  /** Write `df` as standalone parquet and return its data-file paths. */
  private def externalParquet(df: org.apache.spark.sql.DataFrame, parts: Int = 2): Seq[String] = {
    val dir = Files.createTempDirectory("graft-ext").toString
    df.repartition(parts).write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).toSeq
  }

  test("adoption is a metadata commit: rows visible, counted, bounded, time-travelable") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt1", schema, Seq("id"))
    t.append(rows((100, "pre", "c", 1L)))
    val vBefore = t.meta.currentVersion
    val files = externalParquet(rows((1, "a", "c", 1L), (2, "b", "c", 1L), (3, "c", "c", 1L)))
    val n = t.addFiles(files)
    assert(n == 3)
    assert(t.meta.currentVersion == vBefore + 1)
    assert(t.read().count() == 4)
    // all groups data-kind with recorded rows → metadata-only count
    assert(t.fastRowCount.contains(4L))
    // sources were MOVED (default mode)
    assert(files.forall(p => !new java.io.File(p).exists()))
    // the pre-adoption snapshot is intact
    assert(t.readVersion(vBefore).count() == 1)
    // identifier bounds were recorded → key-range read prunes to the group
    assert(t.readKeyRange("id", 1, 3).count() == 3)
  }

  test("a LATER upsert hides adopted keys; adopted rows never beat later commits") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt2", schema, Seq("id"))
    t.addFiles(externalParquet(rows((1, "old", "c", 1L), (2, "keep", "c", 1L))))
    t.merge(rows((1, "new", "u", 2L)))
    val got = t.read().orderBy("id").select("id", "name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, "new"), (2, "keep")))
    // hard delete reaches adopted rows too
    t.merge(rows((2, null, "d", 3L)), CdcApply.UpsertConfig(keepDeletes = false))
    assert(t.read().select("id").as[Int].collect().toSeq == Seq(1))
  }

  test("positional-delete materialization and compaction fold adopted groups correctly") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt3", schema, Seq("id"))
    t.addFiles(externalParquet(rows((1, "a", "c", 1L), (2, "b", "c", 1L))))
    t.merge(rows((1, "a2", "u", 2L)))
    val before = t.read().orderBy("id").select("id", "name").collect().toSeq
    assert(t.materializePositionalDeletes() == 1L) // the hidden adopted row
    assert(t.read().orderBy("id").select("id", "name").collect().toSeq == before)
    t.compact()
    assert(t.read().orderBy("id").select("id", "name").collect().toSeq == before)
    assert(t.fastRowCount.contains(2L))
  }

  test("the change stream recovers adopted rows' commit seq from the dir name") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adoptcs", schema, Seq("id"))
    t.addFiles(externalParquet(rows((1, "a", "c", 1L), (2, "b", "c", 1L)), parts = 1))
    val adoptSeq = t.meta.currentVersion
    val out = java.nio.file.Files.createTempDirectory("adoptcs-out").toString
    val ck = java.nio.file.Files.createTempDirectory("adoptcs-ck").toString
    val q = t.readChangeStream().writeStream
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination(120000)
    val seqs = spark.read.parquet(out)
      .select(ManagedTable.SeqCol).collect().map(r => Option(r.get(0))).toSeq
    assert(seqs.size == 2 && seqs.forall(_.contains(adoptSeq)),
      s"adopted rows streamed with seqs $seqs, expected $adoptSeq")
  }

  test("copy mode leaves sources in place") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt4", schema, Seq("id"))
    val files = externalParquet(rows((1, "a", "c", 1L)))
    t.addFiles(files, copy = true)
    assert(files.forall(p => new java.io.File(p).exists()))
    assert(t.read().count() == 1)
  }

  test("failed commit rolls the moves back — sources restored") {
    val wh = tmpWarehouse()
    val a = ManagedTable.create(spark, wh, "adopt5", schema, Seq("id"))
    val b = ManagedTable.load(spark, wh, "adopt5").get
    b.append(rows((9, "x", "c", 1L))) // stale-ify handle a
    val files = externalParquet(rows((1, "a", "c", 1L)))
    assertThrows[java.util.ConcurrentModificationException] { a.addFiles(files) }
    assert(files.forall(p => new java.io.File(p).exists()), "moved files not restored")
    val re = ManagedTable.load(spark, wh, "adopt5").get
    assert(re.read().count() == 1) // only b's append
  }

  test("schema rules: subset columns null-fill, extra columns invisible, conflicts refused") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt6", schema, Seq("id"))
    // missing __source_ts_ns + an extra column the table doesn't know
    val part = Seq((1, "a", "c", "junk")).toDF("id", "name", "__op", "extra")
    t.addFiles(externalParquet(part, parts = 1))
    val r = t.read().head()
    assert(r.getAs[Any]("__source_ts_ns") == null)
    assert(!t.read().columns.contains("extra"))
    // type conflict on a shared column is refused up front
    val bad = Seq((1L, "a")).toDF("id", "name") // id LONG vs table INT
    assertThrows[IllegalArgumentException] {
      t.addFiles(externalParquet(bad, parts = 1))
    }
    // reserved column refused
    val reserved = Seq((5, 7L)).toDF("id", ManagedTable.SeqCol)
    assertThrows[IllegalArgumentException] {
      t.addFiles(externalParquet(reserved, parts = 1))
    }
  }

  test("derived-transform partitioned tables refuse adoption") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt7", schema, Seq("id"), Seq("bucket(4,id)"))
    assertThrows[IllegalArgumentException] {
      t.addFiles(externalParquet(rows((1, "a", "c", 1L)), parts = 1))
    }
  }

  test("identity-partitioned adoption: one group per tuple, pruning + scoped deletes work") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt8", schema, Seq("id"), Seq("name"))
    // two single-tuple files (the hive-layout shape) — each becomes its
    // own group with the tuple in the manifest
    val fa = externalParquet(rows((1, "a", "c", 1L), (2, "a", "c", 1L)), parts = 1)
    val fb = externalParquet(rows((3, "b", "c", 1L)), parts = 1)
    assert(t.addFiles(fa ++ fb) == 3)
    assert(t.read().count() == 3)
    assert(t.partitions().toSet == Set(Map("name" -> "a"), Map("name" -> "b")))
    // manifest tuple pruning reaches adopted data immediately
    val onlyA = t.readPartitions(_.get("name").contains("a"))
    assert(onlyA.select("id").as[Int].collect().toSet == Set(1, 2))
    assert(onlyA.inputFiles.length < t.read().inputFiles.length)
    // a later upsert hides the adopted key in its partition
    t.merge(rows((1, "a", "u", 2L)))
    assert(t.read().count() == 3)
    assert(t.read().filter(col("id") === 1).select("__op").as[String]
      .collect().toSeq == Seq("u"))
    // written and adopted groups of one logical tuple share the tuple string
    assert(t.partitions().toSet == Set(Map("name" -> "a"), Map("name" -> "b")))
  }

  test("a multi-tuple file is refused BEFORE anything moves") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "adopt9", schema, Seq("id"), Seq("name"))
    val mixed = externalParquet(rows((1, "a", "c", 1L), (2, "b", "c", 1L)), parts = 1)
    assertThrows[IllegalArgumentException] { t.addFiles(mixed) }
    assert(mixed.forall(p => new java.io.File(p).exists()), "sources touched on refusal")
    assert(t.read().count() == 0)
  }
}
