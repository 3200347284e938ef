package graft.tables

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Row-level DML staged onto WAP branches (round 9):
  * [[ManagedTable.deleteWhereOnBranch]] / [[ManagedTable.updateWhereOnBranch]]
  * / [[ManagedTable.mergeInto]]`(stageToBranch=...)` — branch-local
  * ordering, adopt-in-place publish (version advance past every staged
  * seq), the order-preserving re-stamp when live commits intervene, and
  * the changelog view of a published branch.
  */
class BranchDmlSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def wh = java.nio.file.Files.createTempDirectory("graft-brdml").toString

  private def state(t: ManagedTable): Set[(Long, String)] =
    t.read().select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def branchState(t: ManagedTable, b: String): Set[(Long, String)] =
    t.readBranch(b).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("branch DML battery: delete/update/merge stage, publish folds, abandon discards") {
    val w = wh
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "bd", df.schema, Seq("id"))
    t.append(df)
    val liveVersion = t.meta.currentVersion
    t.createBranch("audit")
    t.stageAppendInto(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), "audit")
    // delete a STAGED row and a LIVE row; update a staged row
    t.deleteWhereOnBranch(col("id") === 3L, "audit")
    t.deleteWhereOnBranch(col("id") === 1L, "audit")
    t.updateWhereOnBranch(col("id") === 4L, Map("v" -> lit("d2")), "audit")
    // merge: update live key 2, insert key 5
    t.mergeInto(Seq((2L, "b2"), (5L, "e")).toDF("id", "v"),
      stageToBranch = Some("audit"))
    assert(branchState(t, "audit") == Set((2L, "b2"), (4L, "d2"), (5L, "e")))
    assert(state(t) == Set((1L, "a"), (2L, "b")), "live untouched mid-audit")
    assert(t.meta.currentVersion == liveVersion,
      "staged DML must not burn live snapshot versions")
    // publish: one atomic flip, live == audited view; adopt-in-place
    // advances the pointer past every staged seq
    t.publishBranch("audit")
    assert(state(t) == Set((2L, "b2"), (4L, "d2"), (5L, "e")))
    assert(t.meta.currentVersion > liveVersion)
    // the changelog across the publish carries the staged verdicts:
    // incremental consumers see key 1's hard delete as a tombstone
    val changes = t.readChangesBetween(liveVersion, t.meta.currentVersion)
    assert(changes.filter(col("id") === 1L && col(ManagedTable.TombstoneCol))
      .count() >= 1, "publish must surface the staged delete as a changelog tombstone")
    // a new branch whose DML is abandoned leaves no trace
    t.createBranch("risky")
    t.deleteWhereOnBranch(col("id") === 2L, "risky")
    assert(branchState(t, "risky") == Set((4L, "d2"), (5L, "e")))
    t.abandonBranch("risky")
    assert(state(t) == Set((2L, "b2"), (4L, "d2"), (5L, "e")))
  }

  test("branch-local ordering: insert → delete → re-insert of one key resolves in stage order") {
    val w = wh
    val df = Seq((1L, "seed")).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "ord", df.schema, Seq("id"))
    t.append(df)
    t.createBranch("b")
    t.stageAppendInto(Seq((10L, "first")).toDF("id", "v"), "b")
    t.deleteWhereOnBranch(col("id") === 10L, "b")
    assert(branchState(t, "b") == Set((1L, "seed")), "staged delete hides the staged insert")
    t.stageAppendInto(Seq((10L, "second")).toDF("id", "v"), "b")
    assert(branchState(t, "b") == Set((1L, "seed"), (10L, "second")),
      "a re-insert AFTER the staged delete survives it")
    t.publishBranch("b")
    assert(state(t) == Set((1L, "seed"), (10L, "second")),
      "publish preserves intra-branch order")
  }

  test("re-stamp path: live commits between stage and publish keep DML verdicts and order") {
    val w = wh
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = ManagedTable.create(spark, w, "rs", df.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.append(df)
    t.createBranch("fix")
    t.stageAppendInto(Seq((3L, "c")).toDF("id", "v"), "fix")
    t.deleteWhereOnBranch(col("id") === 1L, "fix")   // live key, staged verdict
    t.updateWhereOnBranch(col("id") === 3L, Map("v" -> lit("c2")), "fix")
    // a LIVE commit intervenes: staged seqs now collide with committed
    // ones, so publish must re-stamp (order- and tombstone-preserving)
    t.append(Seq((9L, "live-later")).toDF("id", "v"))
    t.publishBranch("fix")
    assert(state(t) == Set((2L, "b"), (3L, "c2"), (9L, "live-later")),
      s"re-stamped publish state: ${state(t)}")
    // the delete survived the re-stamp as a real MoR verdict: key 1 is
    // gone even though its live group was written before the branch
    assert(t.read().filter(col("id") === 1L).isEmpty)
  }

  test("refusals: keyless tables, unknown branch, commitProperties on staged merge") {
    val w = wh
    val keyless = ManagedTable.create(spark, w, "kl",
      Seq((1L, "a")).toDF("id", "v").schema, Seq.empty)
    keyless.append(Seq((1L, "a")).toDF("id", "v"))
    keyless.createBranch("b")
    val e = intercept[IllegalArgumentException] {
      keyless.deleteWhereOnBranch(col("id") === 1L, "b")
    }
    assert(e.getMessage.contains("keyed tables only"), e.getMessage)
    val t = ManagedTable.create(spark, w, "kd",
      Seq((1L, "a")).toDF("id", "v").schema, Seq("id"))
    t.append(Seq((1L, "a")).toDF("id", "v"))
    // DML on a not-yet-created branch CREATES it (matching INSERT under
    // spark.wap.branch) — a typo'd branch name stages instead of silently
    // mutating the live table mid-audit
    t.updateWhereOnBranch(col("id") === 1L, Map("v" -> lit("x")), "fresh")
    assert(t.branches().contains("fresh"))
    assert(t.readBranch("fresh").select("v").head().getString(0) == "x")
    assert(t.read().select("v").head().getString(0) == "a", "live untouched")
    t.abandonBranch("fresh")
    t.createBranch("b")
    val e2 = intercept[IllegalArgumentException] {
      t.mergeInto(Seq((1L, "x")).toDF("id", "v"),
        stageToBranch = Some("b"), commitProperties = Map("k" -> "v"))
    }
    assert(e2.getMessage.contains("commitProperties"), e2.getMessage)
    // a no-match branch DML burns neither a generation nor a group
    val before = t.meta.properties(ManagedTable.BranchPrefix + "b")
    t.deleteWhereOnBranch(col("id") === 777L, "b")
    assert(t.meta.properties(ManagedTable.BranchPrefix + "b") == before,
      "a zero-match staged DML must not advance the branch generation")
  }

  test("partitioned branch DML: staged delete scopes stay partition-exact through publish") {
    val w = wh
    val df = (1 to 60).map(i => (i.toLong, i % 3, s"n$i")).toDF("id", "grp", "name")
    val t = ManagedTable.create(spark, w, "pb", df.schema, Seq("id"), Seq("grp"))
    t.append(df)
    t.createBranch("b")
    t.stageAppendInto(Seq((100L, 1, "staged")).toDF("id", "grp", "name"), "b")
    t.deleteWhereOnBranch(col("grp") === 2 && col("id") <= 30L, "b")
    t.updateWhereOnBranch(col("id") === 100L, Map("name" -> lit("upd")), "b")
    val want = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .filterNot { case (id, g, _) => g == 2 && id <= 30 }
      .toSet + ((100L, 1, "upd"))
    def got(d: org.apache.spark.sql.DataFrame): Set[(Long, Int, String)] =
      d.select("id", "grp", "name").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got(t.readBranch("b")) == want)
    assert(got(t.read()).size == 60, "live untouched")
    t.publishBranch("b")
    assert(got(t.read()) == want, "published partitioned DML state")
  }
}
