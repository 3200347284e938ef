package graft.catalog

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-folded CBO column statistics on the V2 scan
  * ([[GraftScan.estimateStatistics]]'s `columnStats`): min/max/nullCount
  * reach the optimizer's per-attribute stats under
  * `spark.sql.cbo.enabled` from one metadata pass — zero file reads.
  */
class V2ColumnStatsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpWarehouse(): String =
    Files.createTempDirectory("graft-v2wh").toString

  private def registerCatalog(wh: String): String = {
    val cat = s"gcs_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("ts", LongType),
    StructField("name", StringType)))

  private def withCbo[A](body: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try body finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  private def scanStats(df: org.apache.spark.sql.DataFrame) = {
    val rels = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r
    }
    assert(rels.nonEmpty, s"no V2 scan in:\n${df.queryExecution.optimizedPlan}")
    rels.head.stats
  }

  test("min/max/nullCount fold from the manifest into CBO attribute stats") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "cs1", schema, Seq.empty, Seq.empty,
      Map("write.cluster-by" -> "ts,name"))
    (0 until 3).foreach { k =>
      t.append((0 until 100).map { i =>
        val ts = if (k == 1 && i % 10 == 0) None else Some((k * 100 + i).toLong)
        (k * 100 + i, ts, s"n$i")
      }.toDF("id", "ts", "name"))
    }
    val cat = registerCatalog(wh)
    withCbo {
      val stats = scanStats(spark.sql(s"SELECT id, ts, name FROM $cat.cs1"))
      assert(stats.rowCount.contains(BigInt(300)))
      val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
      val ts = byName("ts")
      assert(ts.min.contains(0L), s"ts.min ${ts.min}")
      assert(ts.max.contains(299L), s"ts.max ${ts.max}")
      assert(ts.nullCount.contains(BigInt(10)), s"ts.nullCount ${ts.nullCount}")
      // string column: nullCount only (estimators don't range strings)
      val nm = byName("name")
      assert(nm.min.isEmpty && nm.max.isEmpty)
      assert(nm.nullCount.contains(BigInt(0)))
      // id has no cluster-by stats on this keyless table → absent
      assert(!byName.contains("id"))
    }
  }

  test("single-identifier table reports NDV = served rows") {
    val wh = tmpWarehouse()
    val cdc = StructType(schema.fields :+ StructField("__op", StringType))
    val t = ManagedTable.create(spark, wh, "cs2", cdc, Seq("id"))
    t.append((1 to 80).map(i => (i, i.toLong, s"n$i", "u"))
      .toDF("id", "ts", "name", "__op"))
    val cat = registerCatalog(wh)
    withCbo {
      val stats = scanStats(spark.sql(s"SELECT id FROM $cat.cs2"))
      val byName = stats.attributeStats.map { case (a, cs) => a.name -> cs }
      val id = byName("id")
      assert(id.distinctCount.contains(BigInt(80)), s"ndv ${id.distinctCount}")
      assert(id.min.contains(1) && id.max.contains(80), s"${id.min}..${id.max}")
    }
  }

  test("a filter-estimated plan uses the folded range, not a guess") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "cs3", schema, Seq.empty, Seq.empty,
      Map("write.cluster-by" -> "ts"))
    t.append((0 until 1000).map(i => (i, i.toLong, s"n$i")).toDF("id", "ts", "name"))
    val cat = registerCatalog(wh)
    withCbo {
      // selective predicate: CBO's range estimate should shrink rowCount
      // well below the table's 1000 (exact interpolation ≈ 10)
      val stats = spark.sql(s"SELECT * FROM $cat.cs3 WHERE ts < 10")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(rc => rc < BigInt(200)),
        s"filter estimate should use the ts range: ${stats.rowCount}")
    }
  }
}
