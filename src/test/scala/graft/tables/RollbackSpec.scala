package graft.tables

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ManagedTable.rollbackTo]]: metadata-only snapshot restore through the
  * normal commit protocol — state equality, history preservation, GC
  * interaction, and DML-after-rollback.
  */
class RollbackSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def wh = java.nio.file.Files.createTempDirectory("graft-rb").toString

  test("rollback restores the old state as a new version; history intact") {
    val w = wh
    val df1 = (1 to 50).map(i => (i, s"v1_$i")).toDF("id", "s")
    val t = ManagedTable.create(spark, w, "rb", df1.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.append(df1)
    val goodV = t.meta.currentVersion
    t.merge(Seq((1, "corrupted"), (2, "bad")).toDF("id", "s"),
      graft.cdc.CdcApply.UpsertConfig(runDedup = false))
    t.deleteWhere(col("id") > 40)
    assert(t.read().count() == 40)
    val badV = t.meta.currentVersion

    t.rollbackTo(goodV)
    assert(t.meta.currentVersion > badV, "rollback is a NEW version, not a pointer rewind")
    assert(t.read().count() == 50)
    assert(t.read().filter(col("id") === 1).head().getString(1) == "v1_1")
    // the bad version stays time-travelable
    assert(t.readVersion(badV).count() == 40)
    // a reloaded handle sees the rolled-back state (durable commit)
    val re = ManagedTable.load(spark, w, "rb").get
    assert(re.read().count() == 50)
  }

  test("writes continue normally after a rollback") {
    val w = wh
    val df = (1 to 10).map(i => (i, i * 10)).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "rb2", df.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.append(df)
    val v1 = t.meta.currentVersion
    t.merge(Seq((1, -1)).toDF("id", "v"), graft.cdc.CdcApply.UpsertConfig(runDedup = false))
    t.rollbackTo(v1)
    t.merge(Seq((2, -2)).toDF("id", "v"), graft.cdc.CdcApply.UpsertConfig(runDedup = false))
    val m = t.read().collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(m(1) == 10, "rolled-back merge must not resurface")
    assert(m(2) == -2, "post-rollback merge applies")
  }

  test("rollback refuses the current version and unretained targets") {
    val w = wh
    val df = (1 to 5).map(i => (i, i)).toDF("id", "v")
    // retention 1: after a few commits, version 1's manifest is GC'd
    val t = ManagedTable.create(spark, w, "rb3", df.schema, Seq("id"))
    t.append(df)
    intercept[IllegalArgumentException] { t.rollbackTo(t.meta.currentVersion) }
    t.append(df.withColumn("id", col("id") + 10))
    t.append(df.withColumn("id", col("id") + 20))
    t.append(df.withColumn("id", col("id") + 30))
    intercept[IllegalArgumentException] { t.rollbackTo(1L) }
  }

  test("rollback to a tagged version via tags()") {
    val w = wh
    val df = (1 to 5).map(i => (i, i)).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "rb4", df.schema, Seq("id"))
    t.append(df)
    t.tag("good")
    // churn past the retention window — the tag pins the manifest
    (1 to 4).foreach(k => t.overwrite(df.withColumn("v", col("v") + k)))
    t.rollbackTo(t.tags()("good"))
    assert(t.read().collect().map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("all-digit tag and branch names are refused at creation") {
    val w = wh
    val df = (1 to 3).map(i => (i, i)).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "refn", df.schema, Seq("id"))
    t.append(df)
    // readRef resolves digits as snapshot numbers FIRST — an all-digit
    // tag would be unreachable (or worse, silently shadowed by a real
    // snapshot of that number), so creation refuses
    val e = intercept[IllegalArgumentException] { t.tag("123") }
    assert(e.getMessage.contains("snapshot version refs"), e.getMessage)
    intercept[IllegalArgumentException] { t.createBranch("42") }
    intercept[IllegalArgumentException] { t.stageAppend(df, "7") }
    // non-digit names still work and resolve through readRef
    t.tag("v123")
    assert(t.readRef("v123").count() == 3)
  }

  test("diffVersions classifies added/removed/changed between snapshots") {
    val w = wh
    val df = Seq((1, "a", "c", 0L), (2, "b", "c", 0L), (3, "x", "c", 0L))
      .toDF("id", "v", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, w, "dv", df.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.merge(df, graft.cdc.CdcApply.UpsertConfig(keepDeletes = false))
    val v1 = t.meta.currentVersion
    t.merge(Seq((2, "B", "u", 1L), (3, "x", "d", 1L), (4, "d", "c", 1L))
      .toDF("id", "v", "__op", "__source_ts_ns"),
      graft.cdc.CdcApply.UpsertConfig(keepDeletes = false))
    val d = t.diffVersions(v1, t.meta.currentVersion).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(d == Seq((2, "changed"), (3, "removed"), (4, "added")), s"diff: $d")
    // identical snapshots diff to nothing
    assert(t.diffVersions(t.meta.currentVersion, t.meta.currentVersion).isEmpty)
  }
}
