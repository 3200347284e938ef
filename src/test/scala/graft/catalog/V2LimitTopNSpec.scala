package graft.catalog

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pushed LIMIT / ORDER-BY-LIMIT group truncation on the V2 scan
  * ([[GraftScanBuilder.pushLimit]] / [[GraftScanBuilder.pushTopN]]): the
  * plan serves only the manifest groups needed, the retained Limit /
  * TakeOrdered above keeps exact semantics, and ineligible shapes
  * (keyed tables, missing stats, null-holding groups under NULLS FIRST)
  * degrade to the full plan, never to a wrong answer.
  */
class V2LimitTopNSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpWarehouse(): String =
    Files.createTempDirectory("graft-v2wh").toString

  private def registerCatalog(wh: String): String = {
    val cat = s"glt_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("ts", LongType),
    StructField("name", StringType)))

  /** Five commits of 100 rows each with disjoint ts ranges (commit k:
    * ts ∈ [k*100, k*100+99]); `write.cluster-by=ts` records ts bounds +
    * null counts per group.
    */
  private def mkTable(wh: String, name: String,
                      nullsInCommit: Option[Int] = None): ManagedTable = {
    val t = ManagedTable.create(spark, wh, name, schema, Seq.empty, Seq.empty,
      Map("write.cluster-by" -> "ts"))
    (0 until 5).foreach { k =>
      t.append((0 until 100).map { i =>
        val ts = if (nullsInCommit.contains(k) && i % 10 == 0) None
                 else Some((k * 100 + i).toLong)
        (k * 100 + i, ts, s"n${k * 100 + i}")
      }.toDF("id", "ts", "name"))
    }
    t
  }

  /** Distinct manifest GROUPS the physical plan serves — group-dir count
    * over every split's data files (an unpartitioned table chunks all
    * groups into few splits, so split count cannot observe truncation).
    */
  private def plannedGroups(df: DataFrame): Int =
    GraftScan.servedGroupDirs(df)

  test("LIMIT plans only enough groups to cover it; result stays exact") {
    val wh = tmpWarehouse()
    mkTable(wh, "lim1")
    val cat = registerCatalog(wh)
    val df = spark.sql(s"SELECT id, ts FROM $cat.lim1 LIMIT 10")
    assert(plannedGroups(df) == 1, "limit 10 over 5×100-row groups needs one group")
    assert(df.count() == 10)
    // a limit above total rows keeps every group and every row
    val all = spark.sql(s"SELECT id FROM $cat.lim1 LIMIT 100000")
    assert(all.count() == 500)
  }

  test("LIMIT refuses on MoR states (net rows unknowable without reading)") {
    val wh = tmpWarehouse()
    val cdc = StructType(schema.fields :+ StructField("__op", StringType))
    val kt = ManagedTable.create(spark, wh, "limk", cdc, Seq("id"))
    (0 until 3).foreach { k =>
      kt.append((0 until 50).map(i => (k * 50 + i, (k * 50 + i).toLong, s"n$i", "u"))
        .toDF("id", "ts", "name", "__op"))
    }
    // a merge introduces an upsert group = a delete scope → ineligible
    kt.merge(Seq((0, 999L, "redone", "u")).toDF("id", "ts", "name", "__op"),
      graft.cdc.CdcApply.UpsertConfig(runDedup = false))
    val cat = registerCatalog(wh)
    val df = spark.sql(s"SELECT id FROM $cat.limk LIMIT 5")
    assert(df.count() == 5)
    assert(plannedGroups(df) == 4, "a MoR snapshot must keep every group")
  }

  test("a keyed ALL-DATA snapshot (post-compact steady state) truncates") {
    val wh = tmpWarehouse()
    val cdc = StructType(schema.fields :+ StructField("__op", StringType))
    val kt = ManagedTable.create(spark, wh, "limc", cdc, Seq("id"))
    (0 until 3).foreach { k =>
      kt.append((0 until 100).map(i => (k * 100 + i, (k * 100 + i).toLong, s"n$i", "u"))
        .toDF("id", "ts", "name", "__op"))
    }
    val cat = registerCatalog(wh)
    val df = spark.sql(s"SELECT id FROM $cat.limc LIMIT 10")
    assert(df.count() == 10)
    assert(plannedGroups(df) == 1,
      "data-only groups carry no delete scopes; truncation applies")
  }

  test("ORDER BY ts ASC/DESC LIMIT reads only the boundary group") {
    val wh = tmpWarehouse()
    mkTable(wh, "top1")
    val cat = registerCatalog(wh)
    val asc = spark.sql(s"SELECT id, ts FROM $cat.top1 ORDER BY ts LIMIT 5")
    assert(plannedGroups(asc) == 1, "ascending top-5 lives in the first group")
    assert(asc.as[(Int, Long)].collect().toSeq ==
      (0 until 5).map(i => (i, i.toLong)))
    val desc = spark.sql(s"SELECT id, ts FROM $cat.top1 ORDER BY ts DESC LIMIT 5")
    assert(plannedGroups(desc) == 1, "descending top-5 lives in the last group")
    assert(desc.as[(Int, Long)].collect().toSeq ==
      (499 to 495 by -1).map(i => (i, i.toLong)))
  }

  test("a top-n spanning group boundaries keeps exactly the needed groups") {
    val wh = tmpWarehouse()
    mkTable(wh, "top2")
    val cat = registerCatalog(wh)
    val df = spark.sql(s"SELECT id FROM $cat.top2 ORDER BY ts LIMIT 150")
    assert(plannedGroups(df) == 2, "top-150 over 100-row groups needs two")
    assert(df.as[Int].collect().toSeq == (0 until 150))
  }

  test("NULLS FIRST keeps null-holding groups; nulls surface in the answer") {
    val wh = tmpWarehouse()
    mkTable(wh, "topn", nullsInCommit = Some(3)) // commit 3 has 10 nulls
    val cat = registerCatalog(wh)
    // default ASC = NULLS FIRST: the top-5 are five of commit 3's nulls
    val df = spark.sql(s"SELECT id, ts FROM $cat.topn ORDER BY ts LIMIT 12")
    val got = df.collect()
    assert(got.take(10).forall(_.isNullAt(1)), "first 10 must be the nulls")
    assert(got.drop(10).map(_.getLong(1)).toSeq == Seq(0L, 1L))
    // the null-holding group AND the min group must both be planned
    assert(plannedGroups(df) == 2)
    // NULLS LAST: nulls beat nothing; only the min group is needed
    val nl = spark.sql(s"SELECT id, ts FROM $cat.topn ORDER BY ts NULLS LAST LIMIT 5")
    assert(plannedGroups(nl) == 1)
    assert(nl.collect().map(_.getLong(1)).toSeq == (0L until 5L))
  }

  test("multi-key orderings drop only on strict first-key dominance") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "top3", schema, Seq.empty, Seq.empty,
      Map("write.cluster-by" -> "ts"))
    // two groups TIED on ts=100 at the boundary: group A has (ts=100,id=9),
    // group B has (ts=100,id=1) — the true (ts,id) top-2 needs BOTH groups
    t.append(Seq((9, 100L, "a9"), (8, 101L, "a8")).toDF("id", "ts", "name"))
    t.append(Seq((1, 100L, "b1"), (2, 102L, "b2")).toDF("id", "ts", "name"))
    t.append(Seq((5, 500L, "c5"), (6, 501L, "c6")).toDF("id", "ts", "name"))
    val cat = registerCatalog(wh)
    val df = spark.sql(s"SELECT id, ts FROM $cat.top3 ORDER BY ts, id LIMIT 2")
    assert(df.as[(Int, Long)].collect().toSeq == Seq((1, 100L), (9, 100L)))
    assert(plannedGroups(df) == 2, "tied groups both kept, far group dropped")
  }

  test("builder-level contract: partial push; eligibility decided at plan time") {
    val wh = tmpWarehouse()
    val t = mkTable(wh, "b1")
    val b = new GraftScanBuilder(t)
    assert(b.pushLimit(7) && b.isPartiallyPushed)
    // keyed tables accept at the builder (partial push promises nothing);
    // MoR refusal is a PLAN-time decision — see the MoR test above
    val kt = ManagedTable.create(spark, wh, "b2", schema, Seq("id"))
    assert(new GraftScanBuilder(kt).pushLimit(7))
  }
}
