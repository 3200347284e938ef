package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Deletion-vector-at-commit ([[ManagedTable]] `write.mor.posdel-on-commit`):
  * every upsert commit materializes its own equality scope into a posdel
  * sidecar in the SAME commit, so reads between maintenance runs anti-join
  * fixed-width (file, pos) pairs instead of the accumulated equality
  * scopes — the reference's format-v3 write-time deletion vectors
  * (IcebergTableWriterFactory.java:98-99).
  */
class DvOnCommitSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val ops = Vector("c", "i", "r", "u", "d")

  private def randomBatch(rnd: Random, n: Int): DataFrame =
    List.fill(n)((rnd.nextInt(8), s"p${rnd.nextInt(1000)}", ops(rnd.nextInt(5)),
      rnd.nextInt(5).toLong))
      .toDF("id", "name", "__op", "__source_ts_ns")

  private def canon(df: DataFrame): Seq[(Int, String, String, Long)] =
    df.select("id", "name", "__op", "__source_ts_ns").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3, t._4)).toSeq

  private def posdelSeqs(t: ManagedTable): Seq[Long] =
    t.filesMetadata().where(col("kind") === Manifest.PosDel)
      .select("seq").as[Long].collect().toSeq.sorted

  for (keepDeletes <- Seq(true, false)) {
    test(s"DV-at-commit ≡ relational fold; one sidecar per commit (keepDeletes=$keepDeletes)") {
      val rnd = new Random(7 + (if (keepDeletes) 1 else 0))
      val cfg = CdcApply.UpsertConfig(keepDeletes = keepDeletes)
      val wh = java.nio.file.Files.createTempDirectory("graft-dv").toString
      val schema = randomBatch(rnd, 1).schema
      val t = ManagedTable.create(spark, wh, s"dv_$keepDeletes", schema, Seq("id"),
        properties = Map(
          "write.mor.posdel-on-commit" -> "always",
          "write.mor.compact-after-upserts" -> "4"))
      var folded = t.read()
      for (i <- 1 to 6) {
        val batch = randomBatch(rnd, 40)
        t.merge(batch, cfg)
        folded = CdcApply.upsert(folded, batch, Seq("id"), cfg).persist()
        assert(canon(t.read()) == canon(folded), s"diverged at batch $i")
        // the chain is intact: the newest sidecar covers the newest upsert
        // scope (auto minor-compaction may bump the version past the
        // merge commit — the folded group keeps the merge's seq)
        val maxUpsert = t.filesMetadata().where(col("kind") === Manifest.Upsert)
          .agg(max("seq")).as[Long].head()
        assert(posdelSeqs(t).lastOption.contains(maxUpsert),
          s"no sidecar covering upsert seq $maxUpsert")
      }
      t.compact()
      assert(canon(t.read()) == canon(folded), "compaction changed the visible state")
      val re = ManagedTable.load(spark, wh, s"dv_$keepDeletes").get
      assert(canon(re.read()) == canon(folded))
    }
  }

  test("partitioned DV-at-commit ≡ relational fold; per-tuple sidecars; pruned reads apply pairs") {
    val rnd = new Random(21)
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val wh = java.nio.file.Files.createTempDirectory("graft-dvp").toString
    val schema = randomBatch(rnd, 1).schema
    val t = ManagedTable.create(spark, wh, "dvp", schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"),
      properties = Map(
        "write.mor.posdel-on-commit" -> "always",
        "write.mor.compact-after-upserts" -> "4"))
    var folded = t.read()
    for (i <- 1 to 6) {
      val batch = randomBatch(rnd, 40)
      t.merge(batch, cfg)
      folded = CdcApply.upsert(folded, batch, Seq("id"), cfg).persist()
      assert(canon(t.read()) == canon(folded), s"diverged at batch $i")
    }
    // sidecars exist, one chain per tuple, each carrying its tuple in the
    // manifest so pruned reads keep pairs with their groups
    val meta = t.filesMetadata().select("kind", "seq", "partition").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getMap[String, String](2).get("id_bucket").orNull))
    val pd = meta.filter(_._1 == Manifest.PosDel)
    assert(pd.nonEmpty && pd.forall(_._3 != null), s"sidecars missing tuples: ${pd.toSeq}")
    // per-tuple chain coverage: the newest sidecar of every tuple covers
    // that tuple's newest upsert scope (min-seq scopes are inert)
    val upMax = meta.filter(_._1 == Manifest.Upsert).groupBy(_._3)
      .map { case (b, es) => b -> es.map(_._2).max }
    val tupleMin = meta.filter(t => t._1 != Manifest.PosDel).groupBy(_._3)
      .map { case (b, es) => b -> es.map(_._2).min }
    val pdMax = pd.groupBy(_._3).map { case (b, es) => b -> es.map(_._2).max }
    upMax.foreach { case (b, s) =>
      if (s > tupleMin(b))
        assert(pdMax.get(b).contains(s), s"tuple $b: newest scope $s uncovered ($pdMax)")
    }
    // pruned per-tuple reads (pairs applied in-prune) reassemble the table
    val full = canon(t.read())
    val parts = Seq("0", "1").map(b =>
      canon(t.readPartitions(p => p.get("id_bucket").contains(b))))
    assert(parts.forall(_.nonEmpty))
    assert(parts.flatten.sortBy(x => x) == full, "pruned reads diverge from the full read")
    t.compact()
    assert(canon(t.read()) == canon(folded), "compaction changed the visible state")
    val re = ManagedTable.load(spark, wh, "dvp").get
    assert(canon(re.read()) == canon(folded))
  }

  test("partitioned mid-life enable: broken tuple chains degrade to equality; compact restarts them") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dvp-chain").toString
    def batch(ids: Range): DataFrame =
      ids.map(i => (i, s"v$i", "u", 1L)).toDF("id", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "pchain", batch(0 to 0).schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"))
    t.merge(batch(0 until 40))
    t.merge(batch(10 until 30)) // live per-tuple scopes, never materialized
    t.setProperties(Map("write.mor.posdel-on-commit" -> "always"))
    t.merge(batch(20 until 35))
    // a sidecar would illegally cover the older unmaterialized scopes
    assert(posdelSeqs(t).isEmpty, "sidecar written over an unmaterialized older scope")
    assert(t.read().count() == 40)
    t.compact() // clears equality scopes outright → chains restart clean
    t.merge(batch(0 until 5))
    assert(posdelSeqs(t).nonEmpty, "chain did not restart after compact")
    assert(t.read().count() == 40)
    assert(t.read().where(col("id") === 2).select("name").head().getString(0) == "v2")
  }

  test("partitioned broken chain recovers via the per-tuple materializer, no data rewrite") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dvp-mat").toString
    def batch(ids: Range): DataFrame =
      ids.map(i => (i, s"v$i", "u", 1L)).toDF("id", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "pmat", batch(0 to 0).schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"))
    t.merge(batch(0 until 40))
    t.merge(batch(10 until 30)) // live per-tuple scopes, never materialized
    t.setProperties(Map("write.mor.posdel-on-commit" -> "always"))
    t.merge(batch(20 until 35))
    assert(posdelSeqs(t).isEmpty, "chain should be broken before recovery")
    val dataBefore = t.filesMetadata()
      .where(col("kind") =!= Manifest.PosDel).select("path").as[String].collect().toSet
    val before = canon(t.read())
    // recovery: per-tuple sidecars absorb every live scope — both tuples
    // get one, carrying their tuple, and NO data group is rewritten
    val n = t.materializePositionalDeletes()
    assert(n > 0, "expected hidden pairs on both tuples")
    val metaAfter = t.filesMetadata().select("kind", "path", "partition").collect()
    val dataAfter = metaAfter.filter(_.getString(0) != Manifest.PosDel)
      .map(_.getString(1)).toSet
    assert(dataAfter == dataBefore, "recovery must not rewrite data groups")
    val pd = metaAfter.filter(_.getString(0) == Manifest.PosDel)
    assert(pd.length == 2 &&
      pd.forall(_.getMap[String, String](2).contains("id_bucket")),
      s"expected one tuple-carrying sidecar per touched tuple: ${pd.toSeq}")
    assert(canon(t.read()) == before, "recovery changed the visible state")
    // the chain is repaired: the NEXT commit writes per-commit sidecars
    t.merge(batch(0 until 5))
    assert(posdelSeqs(t).lastOption.contains(t.meta.currentVersion),
      "chain did not resume after per-tuple recovery")
    assert(t.read().count() == 40)
    // idempotent: nothing left to absorb
    assert(ManagedTable.load(spark, wh, "pmat").get.read().count() == 40)
  }

  test("multi-epoch partitioned chain recovers via the epoch-aware materializer, no rewrite") {
    val rnd = new Random(33)
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val wh = java.nio.file.Files.createTempDirectory("graft-dvp-epoch").toString
    val schema = randomBatch(rnd, 1).schema
    val t = ManagedTable.create(spark, wh, "pepoch", schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"))
    var folded = t.read()
    def step(n: Int): Unit = {
      val b = randomBatch(rnd, n)
      t.merge(b, cfg)
      folded = CdcApply.upsert(folded, b, Seq("id"), cfg).persist()
    }
    step(40); step(30) // epoch-0 scopes (partition-local under bucket(2))
    t.updatePartitionSpec(Seq("bucket(4,id)"))
    step(30); step(20) // epoch-1 scopes — GLOBAL over every epoch-0 row
    assert(canon(t.read()) == canon(folded), "setup diverged")
    assert(posdelSeqs(t).isEmpty, "no chain should exist yet")
    val dataBefore = t.filesMetadata()
      .where(col("kind") =!= Manifest.PosDel).select("path").as[String].collect().toSet
    // recovery: epoch-local + cross-epoch roles both materialize into the
    // touched tuples' sidecars; NO data group is read-rewritten
    val n = t.materializePositionalDeletes()
    assert(n > 0, "expected hidden pairs across the epochs")
    val metaAfter = t.filesMetadata().select("kind", "path", "partition").collect()
    assert(metaAfter.filter(_.getString(0) != Manifest.PosDel)
      .map(_.getString(1)).toSet == dataBefore,
      "epoch-aware recovery must not rewrite data groups")
    assert(metaAfter.filter(_.getString(0) == Manifest.PosDel)
      .forall(_.getMap[String, String](2).contains("id_bucket")),
      "sidecars must carry their tuples")
    assert(canon(t.read()) == canon(folded), "recovery changed the visible state")
    // partition-pruned reads reassemble the full table: cross-tuple pairs
    // apply (sidecars always pass pruning) and dropped tuples' scopes
    // re-apply as delete carriers
    val full = canon(t.read())
    val parts = Seq("0", "1", "2", "3").map(b =>
      canon(t.readPartitions(p => p.get("id_bucket").contains(b))))
    assert(parts.flatten.sortBy(x => x) == full,
      "pruned reads diverge after epoch-aware materialization")
    // idempotent re-run; later trickle stays exact (scopes above the
    // watermark keep the equality path) and a reload agrees
    t.materializePositionalDeletes()
    assert(canon(t.read()) == canon(folded))
    step(20)
    assert(canon(t.read()) == canon(folded), "post-recovery trickle diverged")
    assert(canon(ManagedTable.load(spark, wh, "pepoch").get.read()) == canon(folded))
  }

  test("auto mode: probe budget and mid-loop candidate bail degrade gracefully") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dv-budget").toString
    def batch(ids: Range): DataFrame =
      ids.map(i => (i, s"v$i", "u", 1L)).toDF("id", "name", "__op", "__source_ts_ns")
    // budget 1: any probe (groups × keys >= 1 … > 1) bails up front in auto
    val t = ManagedTable.create(spark, wh, "budget", batch(0 to 0).schema, Seq("id"),
      properties = Map(
        "write.mor.posdel-on-commit" -> "auto",
        "write.mor.posdel-on-commit.probe-budget" -> "1"))
    t.merge(batch(0 until 50))
    t.merge(batch(10 until 20))
    // the empty-table first commit writes its (empty) sidecar before any
    // prior groups exist (0 × keys never blows the budget); the SECOND
    // commit's probe (1 group × 10 keys > 1) must bail
    assert(posdelSeqs(t) == Seq(1L), "budgeted probe must bail, not build a sidecar")
    assert(t.read().count() == 50, "equality fallback must stay correct")
    assert(t.read().where(col("id") === 15).count() == 1)
    // raising the budget turns sidecars back on for later commits once the
    // chain restarts (materializer absorbs the skipped scope)
    t.setProperties(Map("write.mor.posdel-on-commit.probe-budget" -> "2000000"))
    t.materializePositionalDeletes()
    t.merge(batch(20 until 25))
    assert(posdelSeqs(t).lastOption.contains(t.meta.currentVersion),
      "sidecars did not resume after the budget was raised")
    // mid-loop bail: a batch touching every group exceeds max-file-fraction
    val w2 = java.nio.file.Files.createTempDirectory("graft-dv-frac").toString
    val t2 = ManagedTable.create(spark, w2, "frac", batch(0 to 0).schema, Seq("id"),
      properties = Map("write.mor.posdel-on-commit" -> "auto",
        "write.mor.posdel-on-commit.max-file-fraction" -> "0.25"))
    t2.merge(batch(0 until 30))
    t2.merge(batch(30 until 60))
    t2.merge(batch(60 until 90))
    t2.merge(batch(90 until 120))
    val pdBefore = posdelSeqs(t2).size
    t2.merge(batch(0 until 120)) // candidates = every group > 25%
    assert(posdelSeqs(t2).size == pdBefore,
      "a batch touching every group must skip the sidecar in auto mode")
    assert(t2.read().count() == 120)
  }

  test("broken chain degrades to equality scopes; the maintenance materializer restarts it") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dv-chain").toString
    def batch(ids: Range): DataFrame =
      ids.map(i => (i, s"v$i", "u", 1L)).toDF("id", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "chain", batch(0 to 0).schema, Seq("id"))
    t.merge(batch(0 until 50))
    t.merge(batch(10 until 30)) // live scope at seq 2, never materialized
    t.setProperties(Map("write.mor.posdel-on-commit" -> "always"))
    t.merge(batch(20 until 40))
    // a per-commit sidecar here would illegally cover the seq-2 scope
    assert(posdelSeqs(t).isEmpty, "sidecar written over an unmaterialized older scope")
    val caught = t.materializePositionalDeletes()
    assert(caught > 0)
    t.merge(batch(0 until 5))
    assert(posdelSeqs(t).lastOption.contains(t.meta.currentVersion),
      "chain did not restart after catch-up")
    assert(canon(t.read()) ==
      (0 until 50).map(i => (i, s"v$i", "u", 1L)))
  }

  test("materializer with zero hidden pairs still repairs the chain (empty sidecar)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dv-empty").toString
    def batch(ids: Range): DataFrame =
      ids.map(i => (i, s"v$i", "u", 1L)).toDF("id", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "empt", batch(0 to 0).schema, Seq("id"))
    t.merge(batch(0 until 20))
    t.merge(batch(20 until 40)) // all-new keys: the scope hides NOTHING
    t.setProperties(Map("write.mor.posdel-on-commit" -> "always"))
    assert(t.materializePositionalDeletes() == 0L)
    // the zero-pair sidecar must still exist at the absorbed scope's seq —
    // without it the chain stays broken and per-commit sidecars never resume
    assert(posdelSeqs(t).lastOption.contains(2L),
      s"expected an empty sidecar at seq 2, got ${posdelSeqs(t)}")
    t.merge(batch(0 until 5))
    assert(posdelSeqs(t).lastOption.contains(t.meta.currentVersion),
      "per-commit sidecars did not resume after the empty-sidecar repair")
    assert(t.read().count() == 40)
  }

  test("sidecar pairs touch only bounds/bloom-candidate groups") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dv-cand").toString
    def batch(ids: Range): DataFrame =
      ids.map(i => (i, s"v$i", "u", 1L)).toDF("id", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "cand", batch(0 to 0).schema, Seq("id"),
      properties = Map("write.mor.posdel-on-commit" -> "always"))
    t.merge(batch(0 until 100))    // seq 1: ids 0..99
    t.merge(batch(100 until 200))  // seq 2: ids 100..199
    t.merge(batch(100 until 106))  // seq 3: hides 6 rows, all in the seq-2 group
    val sidecar = t.filesMetadata()
      .where(col("kind") === Manifest.PosDel && col("seq") === 3)
      .select("path").as[String].collect()
    assert(sidecar.length == 1)
    val pairFiles = spark.read.schema(ManagedTable.PosDelSchema)
      .parquet(s"$wh/cand/${sidecar.head}")
      .select("file").distinct().as[String].collect()
    assert(pairFiles.nonEmpty)
    assert(pairFiles.forall(_.contains("upsert-2-")),
      s"pairs leaked outside the candidate group: ${pairFiles.mkString(",")}")
    // and the visible state is the fold
    assert(t.read().count() == 200)
  }
}
