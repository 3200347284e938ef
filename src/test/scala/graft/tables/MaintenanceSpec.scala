package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** [[Maintenance]] — the policy ladder must pick the cheapest sufficient
  * tier from manifest metadata alone, never change the visible state,
  * and terminate on tables whose steady state exceeds a threshold.
  */
class MaintenanceSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mkTable(wh: String, name: String): ManagedTable = {
    val schema = Seq((1, "a", "c", 0L)).toDF("id", "v", "__op", "__source_ts_ns").schema
    ManagedTable.create(spark, wh, name, schema, Seq("id"),
      properties = Map(
        "write.mor.compact-after-upserts" -> "0", // manual maintenance only
        "write.versions-retained" -> "50"))
  }

  private def trickle(t: ManagedTable, n: Int): Unit =
    (1 to n).foreach { i =>
      t.merge(Seq((i % 7, s"v$i", "u", i.toLong)).toDF("id", "v", "__op", "__source_ts_ns"),
        CdcApply.UpsertConfig(keepDeletes = false))
    }

  private def state(t: ManagedTable): Seq[(Int, String)] =
    t.read().select("id", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq

  test("plan escalates through the tiers; run executes them without changing state") {
    val wh = java.nio.file.Files.createTempDirectory("graft-maint").toString
    val t = mkTable(wh, "m1")
    trickle(t, 12)
    val before = state(t)

    val p0 = Maintenance.plan(t, Maintenance.Policy(maxTrickleGroups = 4))
    assert(p0.exists(_.kind == "compactMinor"), s"expected minor tier, got $p0")

    val ran = Maintenance.run(t,
      Maintenance.Policy(maxTrickleGroups = 4, maxDeleteScopes = 0))
    assert(ran.map(_.kind).contains("compactMinor"), s"ran: $ran")
    // after the minor fold one non-base scope (the fold itself) remains,
    // exceeding maxDeleteScopes=0 — the posdel tier fires next
    assert(ran.map(_.kind).contains("materializePositionalDeletes"), s"ran: $ran")
    assert(state(t) == before, "maintenance changed the visible state")

    // a healthy table plans nothing
    assert(Maintenance.plan(t,
      Maintenance.Policy(maxTrickleGroups = 4, maxDeleteScopes = 16)).isEmpty)
  }

  test("partitioned single-epoch tables get the per-tuple materializer tier") {
    val wh = java.nio.file.Files.createTempDirectory("graft-maintp").toString
    val schema = Seq((1, "a", "c", 0L)).toDF("id", "v", "__op", "__source_ts_ns").schema
    val t = ManagedTable.create(spark, wh, "mp", schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"),
      properties = Map(
        "write.mor.compact-after-upserts" -> "0",
        "write.versions-retained" -> "50"))
    trickle(t, 12)
    val before = state(t)
    val plan = Maintenance.plan(t, Maintenance.Policy(
      maxTrickleGroups = 100, maxDeleteScopes = 2, maxLiveFiles = 1000))
    assert(plan.exists(_.kind == "materializePositionalDeletes"),
      s"partitioned tier-3 missing: $plan")
    val ran = Maintenance.run(t, Maintenance.Policy(
      maxTrickleGroups = 100, maxDeleteScopes = 2, maxLiveFiles = 1000))
    assert(ran.map(_.kind).contains("materializePositionalDeletes"), s"ran: $ran")
    assert(state(t) == before, "maintenance changed the visible state")
    // the tuples' scopes are absorbed: re-planning is quiet at the same policy
    assert(Maintenance.plan(t, Maintenance.Policy(
      maxTrickleGroups = 100, maxDeleteScopes = 2, maxLiveFiles = 1000)).isEmpty)
  }

  test("live-file tier compacts once and terminates even if the threshold stays exceeded") {
    val wh = java.nio.file.Files.createTempDirectory("graft-maint2").toString
    val t = mkTable(wh, "m2")
    trickle(t, 6)
    val before = state(t)
    val ran = Maintenance.run(t, Maintenance.Policy(
      maxTrickleGroups = 100, maxDeleteScopes = 100, maxLiveFiles = 2))
    assert(ran.map(_.kind) == Seq("compact"), s"ran: $ran")
    assert(state(t) == before)
    // compact folded everything into one data group — now healthy
    assert(Maintenance.plan(t, Maintenance.Policy(maxLiveFiles = 2)).isEmpty)
  }

  test("expiry runs when requested, alone or after data tiers") {
    val wh = java.nio.file.Files.createTempDirectory("graft-maint3").toString
    val t = mkTable(wh, "m3")
    trickle(t, 4)
    val vs = t.versions()
    assert(vs.size > 2)
    val cutoff = vs(vs.size - 2)._2 // keep only the last two snapshots
    val ran = Maintenance.run(t, Maintenance.Policy(
      maxTrickleGroups = 100, maxDeleteScopes = 100, maxLiveFiles = 1000,
      expireOlderThanMs = Some(cutoff)))
    assert(ran.map(_.kind) == Seq("expireSnapshots"), s"ran: $ran")
    assert(t.versions().size < vs.size)
  }

  test("bloom tier: rebuilds coverage last, after the rewrite tiers reshuffle groups") {
    val wh = java.nio.file.Files.createTempDirectory("graft-maint4").toString
    val t = mkTable(wh, "m4")
    trickle(t, 6)
    val pol = Maintenance.Policy(maxTrickleGroups = 2, maxDeleteScopes = 100,
      maxLiveFiles = 1000, bloomCols = Seq("v"), maxBloomlessGroups = 0)
    // plan: both the minor fold AND the bloom tier fire; fold is ranked first
    val p = Maintenance.plan(t, pol)
    assert(p.map(_.kind).containsSlice(Seq("compactMinor", "buildBlooms")), s"plan: $p")
    val before = state(t)
    val ran = Maintenance.run(t, pol)
    assert(ran.map(_.kind).last == "buildBlooms", s"ran: $ran")
    assert(state(t) == before, "maintenance changed visible state")
    val (have, total) = t.bloomCoverage(Seq("v"))
    assert(have == total && total > 0, s"coverage $have/$total")
    // healthy now: a second run does nothing
    assert(Maintenance.run(t, pol).isEmpty)
    // point lookup through the rebuilt filters
    val probe = t.read().limit(1).collect()(0).getString(1)
    assert(t.readWhereEq("v", probe).count() >= 1)
  }
}
