package graft.catalog

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-epoch keyed V2 reads after positional-delete materialization:
  * a cross-epoch delete scope's (file,pos) pairs land in a sidecar the
  * TARGET tuples' splits may never load, so the cross-delete source list
  * must NOT skip scopes at their own tuple's posdel watermark — skipping
  * resurrects deleted rows (found by review, round 11).
  */
class V2CrossEpochPosdelSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("materialized cross-epoch deletes stay deleted through the V2 read") {
    val wh = Files.createTempDirectory("graft-v2wh").toString
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType),
      StructField("v", LongType),
      StructField("__op", StringType)))
    // epoch 0 unpartitioned → evolve to partitioned: the shape the
    // per-tuple materializer supports (a PRIOR partitioning with an
    // unpartitioned present refuses toward compact instead)
    val t = ManagedTable.create(spark, wh, "xep", schema, Seq("id"))
    t.append(Seq((1, "A", 1L, "u"), (2, "A", 2L, "u"), (3, "B", 3L, "u"))
      .toDF("id", "name", "v", "__op"))
    // evolve the spec → epoch boundary; the delete below lands in the NEW
    // epoch and hides the OLD epoch's row of id=1 globally on identifiers
    t.updatePartitionSpec(Seq("name"))
    t.merge(Seq((1, "A", 0L, "d")).toDF("id", "name", "v", "__op"),
      graft.cdc.CdcApply.UpsertConfig(runDedup = false, keepDeletes = false))
    val want = Set(2, 3)
    assert(t.read().select("id").as[Int].collect().toSet == want)
    // materialize the scopes into posdel sidecars, then read through V2:
    // the deleted row must STAY deleted
    t.materializePositionalDeletes()
    val cat = s"gxe_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val got = spark.sql(s"SELECT id FROM $cat.xep").as[Int].collect().toSet
    assert(got == want, s"materialized cross-epoch delete resurrected: $got")
    // and the differential holds for the whole row set
    assert(spark.sql(s"SELECT id, name, v FROM $cat.xep").collect().map(_.toSeq).toSet ==
      t.read().select("id", "name", "v").collect().map(_.toSeq).toSet)
  }
}
