package graft.catalog

import java.nio.file.Files

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Connector-native streaming writes through the V2 catalog
  * ([[GraftStreamingWrite]]): `writeStream.toTable("<cat>.t")` in Append
  * and Complete modes, per-epoch staged-delta commits, and the
  * replay-marker exactly-once discipline.
  */
class V2StreamingWriteSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpWarehouse(): String =
    Files.createTempDirectory("graft-v2wh").toString

  private def registerCatalog(wh: String): String = {
    val cat = s"gsw_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    cat
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("v", LongType, nullable = true)))

  test("append mode: each micro-batch is one managed append; content exact") {
    val wh = tmpWarehouse()
    ManagedTable.create(spark, wh, "sw1", schema)
    val cat = registerCatalog(wh)
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Int]
    val ck = Files.createTempDirectory("graft-sw-ck").toString
    val q = mem.toDF().select(col("value").as("id"),
        (col("value") * 10L).as("v"))
      .writeStream.option("checkpointLocation", ck).toTable(s"$cat.sw1")
    try {
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      mem.addData(4, 5)
      q.processAllAvailable()
    } finally q.stop()
    val t = ManagedTable.load(spark, wh, "sw1").get
    assert(t.read().select("id", "v").as[(Int, Long)].collect().toSet ==
      Set((1, 10L), (2, 20L), (3, 30L), (4, 40L), (5, 50L)))
    // two non-empty epochs → two data groups, each with recorded stats
    assert(t.v2SnapshotEntries.count(_.kind == graft.tables.Manifest.Data) == 2)
    // the replay marker rode the last commit's pointer flip
    assert(t.meta.properties.keys.exists(_.startsWith("streaming.v2.epoch.")))
    // the staged files are gone — only committed groups remain
    val staging = new java.io.File(s"$wh/sw1/_stream_staging")
    assert(!staging.exists() || staging.listFiles().forall(_.listFiles().isEmpty))
  }

  test("complete mode: each epoch REPLACES the table with the aggregate") {
    val wh = tmpWarehouse()
    val aggSchema = StructType(Seq(
      StructField("k", IntegerType, nullable = true),
      StructField("cnt", LongType, nullable = true)))
    ManagedTable.create(spark, wh, "sw2", aggSchema)
    val cat = registerCatalog(wh)
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[Int]
    val ck = Files.createTempDirectory("graft-sw-ck").toString
    val q = mem.toDF().groupBy((col("value") % 2).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ck).toTable(s"$cat.sw2")
    try {
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      mem.addData(4, 5, 6, 7)
      q.processAllAvailable()
    } finally q.stop()
    val t = ManagedTable.load(spark, wh, "sw2").get
    // final state only: counts over ALL seven values, not an append pile
    assert(t.read().select("k", "cnt").as[(Int, Long)].collect().toSet ==
      Set((0, 3L), (1, 4L)))
  }

  test("replayed epoch commit is a no-op: the marker detects it landed") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "sw3", schema)
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "replay-test-query"
      override def schema(): StructType = V2StreamingWriteSpec.this.schema
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())
    }
    val w = new GraftStreamingWrite(t, info, truncateEachEpoch = false)
    def stageEpoch(epoch: Long, ids: Seq[Int])
        : Array[org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val f = w.createStreamingWriterFactory(null)
      val dw = f.createWriter(0, 0L, epoch)
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      val ser = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
        .createSerializer()
      ids.foreach(i => dw.write(ser(
        org.apache.spark.sql.Row(i, i.toLong)).copy()))
      Array(dw.commit())
    }
    w.commit(0L, stageEpoch(0L, Seq(1, 2)))
    assert(t.read().count() == 2)
    // post-crash re-delivery of epoch 0: must not double-append
    w.commit(0L, stageEpoch(0L, Seq(1, 2)))
    assert(ManagedTable.load(spark, wh, "sw3").get.read().count() == 2)
    // the next epoch lands normally
    w.commit(1L, stageEpoch(1L, Seq(3)))
    assert(ManagedTable.load(spark, wh, "sw3").get.read().count() == 3)
  }

  test("streaming write refuses an active wap branch with a precise error") {
    val wh = tmpWarehouse()
    val t = ManagedTable.create(spark, wh, "sw4", schema)
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "wap-test-query"
      override def schema(): StructType = V2StreamingWriteSpec.this.schema
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())
    }
    val w = new GraftStreamingWrite(t, info, truncateEachEpoch = false)
    spark.conf.set("spark.wap.branch", "audit")
    try {
      val e = intercept[UnsupportedOperationException](w.commit(0L, Array.empty))
      assert(e.getMessage.contains("wap.branch"))
    } finally spark.conf.unset("spark.wap.branch")
  }
}
