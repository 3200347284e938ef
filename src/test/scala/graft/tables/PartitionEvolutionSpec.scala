package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Partition-spec evolution ([[ManagedTable.updatePartitionSpec]]) — the
  * Iceberg partition-evolution semantics re-expressed over graft's
  * seq-epoch encoding: future writes use the new spec, nothing is
  * rewritten, old groups stay scoped under the spec they were written
  * with, cross-epoch upsert scopes are global on the identifier fields,
  * and a full compact() normalizes the table to the current spec.
  */
class PartitionEvolutionSpec extends AnyFunSuite with SharedSpark {
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

  test("MoR ≡ relational fold across two spec evolutions (key-derived specs)") {
    val rnd = new Random(7)
    val cfg = CdcApply.UpsertConfig(keepDeletes = false)
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo").toString
    val schema = randomBatch(rnd, 1).schema
    val t = ManagedTable.create(spark, wh, "evo", schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"))
    var folded = t.read()
    def step(): Unit = {
      val batch = randomBatch(rnd, 40)
      t.merge(batch, cfg)
      folded = CdcApply.upsert(folded, batch, Seq("id"), cfg).persist()
      assert(canon(t.read()) == canon(folded), "MoR state diverged from fold")
    }
    step(); step()
    t.updatePartitionSpec(Seq("bucket(4,id)")) // rebucket: same source key
    step(); step()
    t.updatePartitionSpec(Seq.empty) // partitioned -> unpartitioned
    step(); step()
    // minor compaction folds only current-epoch trickle, never changes state
    t.compactMinor()
    assert(canon(t.read()) == canon(folded), "compactMinor changed visible state")
    // full compaction normalizes to the current (empty) spec
    t.compact()
    assert(canon(t.read()) == canon(folded), "compact changed visible state")
    // reload path agrees
    val re = ManagedTable.load(spark, wh, "evo").get
    assert(canon(re.read()) == canon(folded))
  }

  test("cross-epoch upsert scope is global: new-spec update hides the old partition's row") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo2").toString
    val schema = Seq((1, "A", 1, "c", 0L))
      .toDF("id", "cat", "v", "__op", "__source_ts_ns").schema
    val t = ManagedTable.create(spark, wh, "xepoch", schema, Seq("id"),
      partitionBy = Seq("cat")) // identity partition on a MUTABLE column
    t.merge(Seq((1, "A", 1, "c", 0L)).toDF("id", "cat", "v", "__op", "__source_ts_ns"))
    t.updatePartitionSpec(Seq.empty)
    // under the OLD within-epoch rule this update (cat A -> B) would leave
    // (1, A) visible in the old partition; the cross-epoch global scope
    // must hide it
    t.merge(Seq((1, "B", 2, "u", 1L)).toDF("id", "cat", "v", "__op", "__source_ts_ns"))
    val rows = t.read().select("id", "cat", "v").collect().map(r =>
      (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows == Seq((1, "B", 2)))
  }

  test("pruned read keeps later-epoch carriers for deletes without surfacing their rows") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo3").toString
    val df0 = Seq((1, "A", 1, "c", 0L), (2, "A", 2, "c", 0L), (3, "B", 3, "c", 0L))
      .toDF("id", "cat", "v", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "pruned", df0.schema, Seq("id"),
      partitionBy = Seq("cat"))
    t.merge(df0)
    t.updatePartitionSpec(Seq("bucket(2,id)"))
    // update key 2, delete key 3, insert key 4 — all in the new epoch
    t.merge(Seq((2, "A", 20, "u", 1L), (3, "B", 3, "d", 1L), (4, "B", 4, "c", 1L))
      .toDF("id", "cat", "v", "__op", "__source_ts_ns"),
      CdcApply.UpsertConfig(keepDeletes = false))
    def rows(df: DataFrame) = df.select("id", "cat", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    // full read: updated/inserted/deleted applied
    assert(rows(t.read()) == Seq((1, "A", 1), (2, "A", 20), (4, "B", 4)))
    // prune to the OLD epoch's cat=A groups only: key 1 survives, key 2 is
    // hidden by the (pruned-out) new-epoch update, and the new-epoch rows
    // (2,20) and (4,4) must NOT surface
    val pruned = t.readPartitions(p => p.get("cat").contains("A"))
    assert(rows(pruned) == Seq((1, "A", 1)))
    // an always-true predicate equals the full read
    assert(rows(t.readPartitions(_ => true)) == rows(t.read()))
  }

  test("partitionsMetadata forfeits exact n_rows when a later-epoch upsert can hide the tuple's rows") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo7").toString
    val df0 = Seq((1, "A", 1, "c", 0L), (2, "A", 2, "c", 0L), (3, "B", 3, "c", 0L))
      .toDF("id", "cat", "v", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "pmeta", df0.schema, Seq("id"),
      partitionBy = Seq("cat"))
    t.append(df0) // plain Data groups: counts exact
    def nRows(cat: String): Option[Long] = t.partitionsMetadata()
      .collect().find(_.getMap[String, String](0).get("cat").contains(cat))
      .map(r => if (r.isNullAt(2)) -1L else r.getLong(2))
    assert(nRows("A").contains(2L) && nRows("B").contains(1L))
    // evolve to unpartitioned, then hard-delete id=1 via a cross-epoch
    // upsert: its delete scope is GLOBAL on ids, so it hides a row inside
    // the cat=A tuple even though that tuple's own entries are all Data —
    // reporting 2 as exact would over-count (the visible count is 1)
    t.updatePartitionSpec(Seq.empty)
    t.merge(Seq((1, "A", 1, "d", 1L)).toDF("id", "cat", "v", "__op", "__source_ts_ns"),
      CdcApply.UpsertConfig(keepDeletes = false))
    assert(t.read().filter(org.apache.spark.sql.functions.col("cat") === "A").count() == 1L)
    assert(nRows("A").contains(-1L), "cross-epoch-hidden tuple must report n_rows null")
    assert(nRows("B").contains(-1L))
  }

  test("time travel across the evolution boundary; compact normalizes tuples") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo4").toString
    val df0 = Seq((1, "A", 1, "c", 0L), (2, "B", 2, "c", 0L))
      .toDF("id", "cat", "v", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "ttravel", df0.schema, Seq("id"),
      partitionBy = Seq("cat"),
      properties = Map("write.versions-retained" -> "10"))
    t.merge(df0)
    val preEvo = t.meta.currentVersion
    t.updatePartitionSpec(Seq("bucket(2,id)"))
    t.merge(Seq((1, "A", 10, "u", 1L), (5, "C", 5, "c", 1L))
      .toDF("id", "cat", "v", "__op", "__source_ts_ns"))
    def rows(df: DataFrame) = df.select("id", "cat", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(rows(t.readVersion(preEvo)) == Seq((1, "A", 1), (2, "B", 2)))
    assert(rows(t.read()) == Seq((1, "A", 10), (2, "B", 2), (5, "C", 5)))
    // mixed tuples before compact (old identity tuples + new bucket tuples)
    assert(t.partitions().exists(_.contains("cat")))
    assert(t.partitions().exists(_.contains("id_bucket")))
    val state = rows(t.read())
    t.compact()
    assert(rows(t.read()) == state, "compact changed visible state")
    // normalized: every live tuple is under the current spec
    assert(t.partitions().forall(p => p.keySet == Set("id_bucket")))
    // a fresh pruned read on the normalized table is plain pruning again
    assert(rows(t.readPartitions(_ => true)) == state)
  }

  test("guards: conflicting derived names, old partition sources, staged branches") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo5").toString
    val df0 = Seq((1, "A", "x", "c", 0L)).toDF("id", "cat", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "guards", df0.schema, Seq("id"),
      partitionBy = Seq("bucket(2,id)"))
    t.merge(df0)
    // rebucketing across epochs is legal (same source+transform, new N) —
    // the canonical partition-evolution use case
    t.updatePartitionSpec(Seq("cat"))
    t.updatePartitionSpec(Seq("bucket(4,id)"))
    // old epoch's source column stays rename/drop-protected
    assertThrows[IllegalArgumentException](t.renameColumn("id", "id2"))
    assertThrows[IllegalArgumentException](t.dropColumn("cat"))
    // staged WAP branch blocks evolution
    t.stageAppend(Seq((9, "Z", "z", "c", 9L))
      .toDF("id", "cat", "name", "__op", "__source_ts_ns"), "wip")
    assertThrows[IllegalArgumentException](t.updatePartitionSpec(Seq("name")))
    t.abandonBranch("wip")
    t.updatePartitionSpec(Seq("truncate(name,1)")) // fine after abandon
  }

  test("pre-commit spec swap leaves no epoch history") {
    val wh = java.nio.file.Files.createTempDirectory("graft-pevo6").toString
    val schema = Seq((1, "A")).toDF("id", "cat").schema
    val t = ManagedTable.create(spark, wh, "fresh", schema, Seq("id"),
      partitionBy = Seq("cat"))
    t.updatePartitionSpec(Seq("bucket(2,id)"))
    assert(!t.meta.properties.contains(ManagedTable.SpecHistoryKey))
    t.append(Seq((1, "A")).toDF("id", "cat"))
    assert(t.partitions().forall(_.keySet == Set("id_bucket")))
  }
}
