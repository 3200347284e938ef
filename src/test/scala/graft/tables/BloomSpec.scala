package graft.tables

import graft.SharedSpark
import graft.cdc.CdcApply
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** [[ManagedTable.buildBlooms]] / [[ManagedTable.readWhereEq]] — manifest
  * Bloom filters for equality pruning on unsorted columns.
  */
class BloomSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpWarehouse(): String = Files.createTempDirectory("graft-wh").toString

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("tag", StringType),
    StructField("v", LongType),
    StructField("__op", StringType)))

  private def rows(t: (Int, String, Long)*) =
    t.toSeq.toDF("id", "tag", "v").withColumn("__op", lit("u"))

  test("readWhereEq ≡ filter on string and long columns; filters survive reload") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "b1", schema, Seq("id"))
    // three separate commits → three groups with disjoint tag spaces
    t.append(rows((1 to 50).map(i => (i, s"alpha$i", i * 3L)): _*))
    t.append(rows((51 to 100).map(i => (i, s"beta$i", i * 3L)): _*))
    t.append(rows((101 to 150).map(i => (i, s"gamma$i", i * 3L)): _*))
    assert(t.buildBlooms(Seq("tag", "v")) == 3)
    for (probe <- Seq("alpha7", "beta77", "gamma149", "nosuch")) {
      val got = t.readWhereEq("tag", probe).select("id").as[Int].collect().toSet
      val want = t.read().filter(col("tag") === probe).select("id").as[Int].collect().toSet
      assert(got == want, s"probe $probe")
    }
    assert(t.readWhereEq("v", 33L).select("id").as[Int].collect().toSeq == Seq(11))
    // reload: filters ride the manifest
    val re = ManagedTable.load(spark, wh, "b1").get
    assert(re.readWhereEq("tag", "beta77").count() == 1)
  }

  test("pruning is real: a one-group probe opens one group's files") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "b2", schema, Seq("id"))
    t.append(rows((1 to 40).map(i => (i, s"x$i", i.toLong)): _*))
    t.append(rows((41 to 80).map(i => (i, s"y$i", i.toLong)): _*))
    t.buildBlooms(Seq("tag"))
    val all = t.read().inputFiles.length
    val probed = t.readWhereEq("tag", "y55").inputFiles.length
    assert(probed < all, s"no pruning: $probed vs $all")
    assert(t.readWhereEq("tag", "y55").count() == 1)
  }

  test("groups committed after the build have no filter and are never pruned") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "b3", schema, Seq("id"))
    t.append(rows((1, "old", 1L)))
    t.buildBlooms(Seq("tag"))
    t.append(rows((2, "fresh", 2L)))
    assert(t.readWhereEq("tag", "fresh").select("id").as[Int].collect().toSeq == Seq(2))
  }

  test("sound under MoR deletes: a bloom-pruned read never resurrects hidden rows") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "b4", schema, Seq("id"))
    t.merge(rows((1, "keep", 1L), (2, "drop", 2L)),
      CdcApply.UpsertConfig(dedupColumn = "v"))
    t.buildBlooms(Seq("tag"))
    // hard-delete id=2, then probe its old tag: the delete landed AFTER
    // the build, in a bloom-less upsert group that must still hide it
    t.merge(Seq((2, "drop", 2L, "d")).toDF("id", "tag", "v", "__op"),
      CdcApply.UpsertConfig(keepDeletes = false, dedupColumn = "v"))
    assert(t.readWhereEq("tag", "drop").count() == 0)
    assert(t.readWhereEq("tag", "keep").count() == 1)
    // compaction rewrites groups → their filters drop with the entries
    t.compact()
    assert(t.readWhereEq("tag", "keep").count() == 1)
    val re = ManagedTable.load(spark, wh, "b4").get
    assert(re.meta.currentVersion == t.meta.currentVersion)
  }

  test("guards: unknown column, non-power-of-two bits, null probe") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "b5", schema, Seq("id"))
    t.append(rows((1, "a", 1L)))
    assertThrows[IllegalArgumentException] { t.buildBlooms(Seq("nope")) }
    assertThrows[IllegalArgumentException] { t.buildBlooms(Seq("tag"), bits = 1000) }
    assertThrows[IllegalArgumentException] { t.readWhereEq("tag", null) }
  }
}
