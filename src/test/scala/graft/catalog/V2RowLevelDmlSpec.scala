package graft.catalog

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Native UPDATE / MERGE / complex DELETE through the V2 catalog — the
  * [[GraftRowLevelOps]] delta-write protocol, differentially checked
  * against the ManagedTable verbs the SQL surface dispatches to
  * (updateWhere / mergeInto / deleteWhere): Spark's own rewrite rules
  * must land the SAME table state as the direct API on a parity table.
  */
class V2RowLevelDmlSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpWarehouse(): String =
    Files.createTempDirectory("graft-v2rl").toString

  private def registerCatalog(wh: String): String = {
    val cat = s"gvrl_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  // id and cat declared non-nullable: they form the delta row id
  // (identifier + partition source) and Spark's protocol requires it
  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("cat", StringType, nullable = false),
    StructField("v", DoubleType)))

  private def base: DataFrame = (1 to 40).map(i =>
    (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", i * 1.5))
    .toDF("id", "cat", "v")

  /** Two identical tables: one driven through V2 SQL, one through the API. */
  private def twin(wh: String, partitionBy: Seq[String] = Seq.empty)
      : (ManagedTable, ManagedTable) = {
    val t1 = ManagedTable.create(spark, wh, "t_v2", schema, Seq("id"), partitionBy)
    val t2 = ManagedTable.create(spark, wh, "t_api", schema, Seq("id"), partitionBy)
    t1.append(base); t2.append(base)
    (t1, t2)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def assertSameState(wh: String): Unit = {
    val v2 = ManagedTable.load(spark, wh, "t_v2").get.read().select("id", "cat", "v")
    val api = ManagedTable.load(spark, wh, "t_api").get.read().select("id", "cat", "v")
    assert(sortedRows(v2) == sortedRows(api))
  }

  test("V2 UPDATE ≡ updateWhere: in-place set, unpartitioned keyed") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (_, api) = twin(wh)
    spark.sql(s"UPDATE $cat.t_v2 SET v = v * 2, cat = 'x' WHERE id <= 10 OR cat = 'c'")
    api.updateWhere(col("id") <= 10 || col("cat") === "c",
      Map("v" -> (col("v") * 2), "cat" -> lit("x")))
    assertSameState(wh)
  }

  test("V2 UPDATE ≡ updateWhere: identifier reassignment tombstones the old identity") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (_, api) = twin(wh)
    spark.sql(s"UPDATE $cat.t_v2 SET id = id + 100 WHERE id BETWEEN 3 AND 6")
    api.updateWhere(col("id").between(3, 6), Map("id" -> (col("id") + 100)))
    assertSameState(wh)
    val re = ManagedTable.load(spark, wh, "t_v2").get.read()
    assert(re.where(col("id").between(3, 6)).count() == 0L)
    assert(re.where(col("id").between(103, 106)).count() == 4L)
    assert(re.count() == 40L)
  }

  test("V2 UPDATE ≡ updateWhere: partition-source reassignment moves tuples") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (_, api) = twin(wh, partitionBy = Seq("cat"))
    spark.sql(s"UPDATE $cat.t_v2 SET cat = 'moved' WHERE cat = 'a' AND id < 20")
    api.updateWhere(col("cat") === "a" && col("id") < 20, Map("cat" -> lit("moved")))
    assertSameState(wh)
    val re = ManagedTable.load(spark, wh, "t_v2").get
    val tuples = re.filesMetadata().select("partition").collect()
      .map(_.getMap[String, String](0).get("cat").orNull).toSet
    assert(tuples.contains("moved"))
  }

  test("V2 MERGE ≡ mergeInto: update/delete/insert clause battery") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (_, api) = twin(wh)
    // matched & v > 30 → delete; matched otherwise → update; unmatched → insert
    val src = (25 to 50).map(i => (i, "s", i * 10.0)).toDF("id", "cat", "v")
    src.createOrReplaceTempView("rl_src")
    spark.sql(
      s"""MERGE INTO $cat.t_v2 AS t USING rl_src AS s ON t.id = s.id
         |WHEN MATCHED AND t.v > 45.0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, cat = s.cat
         |WHEN NOT MATCHED THEN INSERT (id, cat, v) VALUES (s.id, s.cat, s.v)
         |""".stripMargin)
    api.mergeInto(src,
      updateWhen = Some(!(col("t.v") > 45.0)),
      updateSet = Map("v" -> col("s.v"), "cat" -> col("s.cat")),
      deleteWhen = Some(col("t.v") > 45.0),
      insertWhen = Some(lit(true)))
    assertSameState(wh)
  }

  test("V2 MERGE: NOT MATCHED BY SOURCE clauses") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val t1 = ManagedTable.create(spark, wh, "t_v2", schema, Seq("id"))
    t1.append(base)
    val src = (1 to 20).map(i => (i, "s", 0.0)).toDF("id", "cat", "v")
    src.createOrReplaceTempView("rl_src_bs")
    spark.sql(
      s"""MERGE INTO $cat.t_v2 AS t USING rl_src_bs AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET cat = 'kept'
         |WHEN NOT MATCHED BY SOURCE AND t.id > 35 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET cat = 'orphan'
         |""".stripMargin)
    val re = ManagedTable.load(spark, wh, "t_v2").get.read()
    assert(re.count() == 35L)
    assert(re.where(col("id") <= 20 && col("cat") =!= "kept").count() == 0L)
    assert(re.where(col("id").between(21, 35) && col("cat") =!= "orphan").count() == 0L)
  }

  test("V2 DELETE with subquery takes the delta path and matches deleteWhere") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (_, api) = twin(wh)
    Seq("a").toDF("k").createOrReplaceTempView("rl_kill")
    spark.sql(s"DELETE FROM $cat.t_v2 WHERE cat IN (SELECT k FROM rl_kill) AND v < 50.0")
    api.deleteWhere(col("cat") === "a" && col("v") < 50.0)
    assertSameState(wh)
  }

  test("V2 UPDATE under spark.wap.branch stages; publish folds in") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (v2, _) = twin(wh)
    val liveBefore = sortedRows(v2.read().select("id", "cat", "v"))
    spark.conf.set("spark.wap.branch", "audit")
    try {
      spark.sql(s"UPDATE $cat.t_v2 SET cat = 'staged' WHERE id <= 5")
      val t = ManagedTable.load(spark, wh, "t_v2").get
      // live untouched; branch view carries the update
      assert(sortedRows(t.read().select("id", "cat", "v")) == liveBefore)
      assert(t.readBranch("audit").where(col("cat") === "staged").count() == 5L)
      // and the V2 read in the same session resolves the branch view
      assert(spark.sql(s"SELECT * FROM $cat.t_v2 WHERE cat = 'staged'").count() == 5L)
      t.publishBranch("audit")
      assert(t.read().where(col("cat") === "staged").count() == 5L)
    } finally spark.conf.unset("spark.wap.branch")
  }

  test("keyless tables: translatable V2 DELETE still works; UPDATE refuses") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val t = ManagedTable.create(spark, wh, "t_v2", schema, Seq.empty)
    t.append(base)
    spark.sql(s"DELETE FROM $cat.t_v2 WHERE id <= 10")
    assert(ManagedTable.load(spark, wh, "t_v2").get.read().count() == 30L)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.t_v2 SET v = 0.0 WHERE id = 11")
    }
    assert(e.getMessage != null)
  }

  test("nullable row id column: UPDATE unsupported, translatable DELETE keeps working") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val nullableCat = StructType(schema.fields.map(f =>
      if (f.name == "cat") f.copy(nullable = true) else f))
    val t = ManagedTable.create(spark, wh, "t_v2", nullableCat, Seq("id"), Seq("cat"))
    t.append(base)
    // ineligible tables don't carry the row-level interface (its presence
    // would break SupportsDelete-based DELETEs at analysis) — UPDATE gets
    // Spark's standard capability error...
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.t_v2 SET v = 0.0 WHERE id = 1")
    }
    assert(e.getMessage.contains("UPDATE"))
    // ...and the filter-based DELETE path is untouched by the mixin gate
    spark.sql(s"DELETE FROM $cat.t_v2 WHERE id <= 10")
    assert(ManagedTable.load(spark, wh, "t_v2").get.read().count() == 30L)
  }

  test("delta staging leaves no debris and no-match DML commits nothing") {
    val wh = tmpWarehouse(); val cat = registerCatalog(wh)
    val (v2, _) = twin(wh)
    val vBefore = v2.meta.currentVersion
    spark.sql(s"UPDATE $cat.t_v2 SET v = 0.0 WHERE id > 10000")
    val t = ManagedTable.load(spark, wh, "t_v2").get
    assert(t.meta.currentVersion == vBefore, "no-match UPDATE must not burn a version")
    val staging = new org.apache.hadoop.fs.Path(s"$wh/t_v2/_delta_staging")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(staging) || fs.listStatus(staging).isEmpty,
      "staged delta files must be swept after commit")
  }
}
