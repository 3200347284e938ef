package graft.tables

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Null counts riding the manifest column bounds ([[ColBounds.nulls]]):
  * recorded by the write-path stats aggregation (zero extra jobs — the
  * same `observe` that collects min/max), JSON round-tripped, and -1
  * (unknown) on pre-upgrade manifests. Consumers: top-N scan truncation's
  * null-ordering accounting, CBO column statistics.
  */
class StatsNullCountSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def wh(): String = Files.createTempDirectory("graft-wh").toString

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("ts", LongType),
    StructField("name", StringType)))

  test("distributed write records per-group null counts for stat columns") {
    val t = ManagedTable.create(spark, wh(), "nc1", schema, Seq.empty,
      properties = Map("write.cluster-by" -> "ts,name"))
    t.append((1 to 100).map(i =>
      (i, if (i % 4 == 0) None else Some(i.toLong), s"n$i"))
      .toDF("id", "ts", "name"))
    t.append((101 to 200).map(i => (i, Some(i.toLong), s"n$i"))
      .toDF("id", "ts", "name"))
    val entries = t.v2SnapshotEntries.sortBy(_.seq)
    assert(entries.length == 2)
    assert(entries.head.stats("ts").nulls == 25L)
    assert(entries.head.stats("name").nulls == 0L)
    assert(entries.last.stats("ts").nulls == 0L)
    // bounds still describe the non-null values only
    assert(entries.head.stats("ts").min.asInstanceOf[Number].longValue() == 1L)
  }

  test("null counts survive a manifest JSON round-trip and reload") {
    val dir = wh()
    val t = ManagedTable.create(spark, dir, "nc2", schema, Seq("id"))
    t.append((1 to 10).map(i => (i, Some(i.toLong), s"n$i"))
      .toDF("id", "ts", "name").withColumn("__op", lit("u")))
    val re = ManagedTable.load(spark, dir, "nc2").get
    val st = re.v2SnapshotEntries.head.stats("id")
    assert(st.nulls == 0L)
    // explicit round-trip of the JSON codec, including the unknown default
    val e = ManifestEntry("p", Manifest.Data, 1L,
      stats = Map("a" -> ColBounds("i", 1L, 9L, 3L, 7L), "b" -> ColBounds("s", "a", "z")))
    val back = Manifest.fromJson(Manifest.toJson(Seq(e))).head
    assert(back.stats("a").nulls == 3L && back.stats("a").ndv == 7L)
    assert(back.stats("b").nulls == -1L && back.stats("b").ndv == -1L)
  }

  test("driver-local commit path records null counts too") {
    val t = ManagedTable.create(spark, wh(), "nc3", schema, Seq.empty,
      properties = Map("write.cluster-by" -> "ts"))
    // the local-commit path engages for small driver-side batches
    val rows = (1 to 8).map(i =>
      org.apache.spark.sql.Row(i, if (i <= 3) null else i.toLong, s"n$i"))
    val bounds = LocalCommit.bounds(rows, schema, Seq("ts" -> "i", "name" -> "s"))
    assert(bounds("ts").nulls == 3L)
    assert(bounds("name").nulls == 0L)
  }
}
