package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential property test: the merge-on-read table (seq-scoped
  * self-deleting upsert groups + tombstones) must reach exactly the state
  * the pure relational fold `CdcApply.upsert` computes — the semantics the
  * driver hash-checks against DuckDB (`cdc_upsert_*`). Runs seeded random
  * batch sequences with dense key/ts collisions under both keepDeletes
  * modes, and re-checks after compaction and a reload (recovery path).
  */
class MorEquivalenceSpec extends AnyFunSuite with SharedSpark {
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

  for (keepDeletes <- Seq(true, false); partitioned <- Seq(false, true)) {
    test(s"MoR ≡ CdcApply.upsert fold over random batches " +
        s"(keepDeletes=$keepDeletes, partitioned=$partitioned)") {
      val rnd = new Random(42 + (if (keepDeletes) 1 else 0))
      val cfg = CdcApply.UpsertConfig(keepDeletes = keepDeletes)
      val wh = java.nio.file.Files.createTempDirectory("graft-moreq").toString
      val schema = randomBatch(rnd, 1).schema
      // the partitioned variant buckets on the KEY, so partition-scoped
      // deletes coincide with the global relational fold semantics
      val t = ManagedTable.create(spark, wh, s"eq_$keepDeletes", schema, Seq("id"),
        partitionBy = if (partitioned) Seq("bucket(2,id)") else Seq.empty,
        // exercise the auto-compact path mid-sequence too
        properties = Map("write.mor.compact-after-upserts" -> "4"))
      var folded = t.read() // empty
      for (_ <- 1 to 6) {
        val batch = randomBatch(rnd, 40)
        t.merge(batch, cfg)
        folded = CdcApply.upsert(folded, batch, Seq("id"), cfg)
          .persist() // the fold chain grows; pin each step
        assert(canon(t.read()) == canon(folded), "MoR state diverged from relational fold")
      }
      // compaction must be a no-op on the visible state
      t.compact()
      assert(canon(t.read()) == canon(folded), "compaction changed the visible state")
      // and a reload (crash-recovery path) sees the same state
      val re = ManagedTable.load(spark, wh, s"eq_$keepDeletes").get
      assert(canon(re.read()) == canon(folded))
    }
  }

  test("double-typed identifier: -0.0 and 0.0 dedup as ONE SQL key on the trickle path") {
    import spark.implicits._
    // SQL grouping normalizes -0.0 == 0.0; a driver-side fold keyed on
    // java.lang.Double would split them — such key types must route to
    // the distributed dedup (and either way the table must hold one row)
    val wh = java.nio.file.Files.createTempDirectory("graft-negzero").toString
    val batch = Seq((0.0, "first", "u", 1L), (-0.0, "second", "u", 2L))
      .toDF("k", "name", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "nz", batch.schema, Seq("k"))
    t.merge(batch)
    val rows = t.read().select("name").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("second"),
      s"-0.0/0.0 must collapse to one key with the ts=2 winner, got ${rows.toSeq}")
  }
}
