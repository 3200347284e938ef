package graft.tables

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** [[ManagedTable.analyzeColumns]] — the ANALYZE procedure: backfills
  * manifest column stats (bounds/nulls/NDV) for arbitrary columns as one
  * metadata-only commit, enabling top-N truncation and CBO on columns
  * the write path didn't index.
  */
class AnalyzeColumnsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def wh(): String = Files.createTempDirectory("graft-wh").toString

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("ts", LongType),
    StructField("name", StringType)))

  test("analyze backfills bounds/nulls/ndv for a previously unindexed column") {
    val dir = wh()
    val t = ManagedTable.create(spark, dir, "an1", schema)
    (0 until 3).foreach { k =>
      t.append((0 until 100).map { i =>
        val ts = if (k == 1 && i % 10 == 0) None else Some((k * 100 + i).toLong)
        (k * 100 + i, ts, s"n$i")
      }.toDF("id", "ts", "name"))
    }
    // no cluster-by, keyless: nothing indexed at write time
    assert(t.v2SnapshotEntries.forall(_.stats.isEmpty))
    val vBefore = t.meta.currentVersion
    val (updated, cols) = t.analyzeColumns(Seq("ts", "id"))
    assert(updated == 3 && cols == Seq("ts", "id"))
    assert(t.meta.currentVersion == vBefore + 1, "one metadata-only commit")
    val re = ManagedTable.load(spark, dir, "an1").get
    val e0 = re.v2SnapshotEntries.sortBy(_.seq).head.stats
    assert(e0("ts").min.asInstanceOf[Number].longValue() == 0L)
    assert(e0("ts").max.asInstanceOf[Number].longValue() == 99L)
    assert(e0("ts").nulls == 0L && e0("ts").ndv > 80L)
    val e1 = re.v2SnapshotEntries.sortBy(_.seq).apply(1).stats
    assert(e1("ts").nulls == 10L)
    // reads unchanged; the analyzed bounds now prune V2 scans
    assert(re.read().count() == 300)
    val cat = s"gan_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    def groups(sql: String): Int =
      graft.catalog.GraftScan.servedGroupDirs(spark.sql(sql))
    assert(groups(s"SELECT * FROM $cat.an1 WHERE id <= 50") == 1,
      "analyzed id bounds must prune the scan to the first group")
  }

  test("empty column list analyzes the write path's stat columns") {
    val dir = wh()
    val cdc = StructType(schema.fields :+ StructField("__op", StringType))
    val t = ManagedTable.create(spark, dir, "an2", cdc, Seq("id"))
    t.append((1 to 50).map(i => (i, i.toLong, s"n$i", "u"))
      .toDF("id", "ts", "name", "__op"))
    val (updated, cols) = t.analyzeColumns()
    assert(cols == Seq("id"))
    assert(updated == 1) // refreshed in place
  }

  test("precise refusals: unknown column, no analyzable types, folds") {
    val dir = wh()
    val t = ManagedTable.create(spark, dir, "an3", schema)
    t.append(Seq((1, 1L, "a")).toDF("id", "ts", "name"))
    assert(intercept[IllegalArgumentException](
      t.analyzeColumns(Seq("nope"))).getMessage.contains("no column"))
    val bt = ManagedTable.create(spark, dir, "an4", StructType(Seq(
      StructField("b", BinaryType), StructField("id", IntegerType))))
    bt.append(Seq((Array[Byte](1), 1)).toDF("b", "id"))
    assert(intercept[IllegalArgumentException](
      bt.analyzeColumns(Seq("b"))).getMessage.contains("no analyzable column"))
  }

  test("CALL graft.system.analyze through the V2 procedure catalog") {
    val dir = wh()
    val t = ManagedTable.create(spark, dir, "an5", schema)
    t.append((1 to 40).map(i => (i, i.toLong, s"n$i")).toDF("id", "ts", "name"))
    val cat = s"gan_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", dir)
    val row = spark.sql(s"CALL $cat.system.analyze('an5', 'ts')").collect().head
    assert(row.getLong(0) == 1L && row.getString(1) == "ts")
    assert(ManagedTable.load(spark, dir, "an5").get
      .v2SnapshotEntries.head.stats.contains("ts"))
  }
}
