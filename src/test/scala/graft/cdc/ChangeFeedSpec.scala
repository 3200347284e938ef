package graft.cdc

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ChangeFeed]] — graft as a CDC source: exported envelopes must
  * round-trip through the standard ingest path ([[EventDecoder]] infer +
  * decode, C2 dedup, upsert fold) and reconstruct the exact source table
  * state, including hard deletes and multi-version keys across commits.
  */
class ChangeFeedSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def mkSource(wh: String): ManagedTable = {
    val b = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      java.sql.Date.valueOf("2024-01-05"), 1.5, "c", 0L))
      .toDF("id", "name", "ts", "d", "v", "__op", "__source_ts_ns")
    ManagedTable.create(spark, wh, "src", b.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
  }

  private def merge(t: ManagedTable, rows: Seq[(Long, String, String, String, Double, String, Long)]): Unit =
    t.merge(rows.map { case (id, n, ts, d, v, op, tsn) =>
      (id, n, java.sql.Timestamp.valueOf(ts), java.sql.Date.valueOf(d), v, op, tsn)
    }.toDF("id", "name", "ts", "d", "v", "__op", "__source_ts_ns"),
      CdcApply.UpsertConfig(keepDeletes = false))

  private def canon(df: DataFrame): Seq[String] =
    df.select("id", "name", "ts", "d", "v").collect().map(_.toString).sorted.toSeq

  test("envelopes round-trip the full changelog into an identical replica") {
    val wh = java.nio.file.Files.createTempDirectory("graft-feed").toString
    val t = mkSource(wh)
    merge(t, Seq(
      (1L, "a", "2024-01-01 10:00:00", "2024-01-05", 1.5, "c", 1L),
      (2L, "b", "2024-01-02 11:30:00", "2024-01-06", 2.5, "c", 1L)))
    merge(t, Seq(
      (1L, "a2", "2024-01-03 09:15:00", "2024-01-07", 9.9, "u", 2L),
      (3L, "c", "2024-01-04 23:59:59", "2024-01-08", 3.25, "c", 2L)))
    merge(t, Seq(
      (2L, "b", "2024-01-02 11:30:00", "2024-01-06", 2.5, "d", 3L)))

    val env = ChangeFeed.envelopes(t, 0L, t.meta.currentVersion, "graft.db.src")
    assert(env.columns.toSeq == Seq("destination", "key", "value"))

    // standard ingest path: infer from the embedded schemas, decode, C2
    // dedup on the exported sequence, fold
    val collected = env.localCheckpoint(true)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = collected.collect()
    val valueSchemas = rows.map(r =>
      mapper.readTree(r.getString(2)).get("schema").toString).distinct.toSeq
    val keySchema = Some(mapper.readTree(rows.head.getString(1)).get("schema").toString)
    val inferred = EventDecoder.infer(valueSchemas.sorted, keySchema)
    assert(inferred.identifierFields == Seq("id"), s"ids: ${inferred.identifierFields}")
    val typed = EventDecoder.decode(collected, inferred)
    val cfg = CdcApply.UpsertConfig(keepDeletes = false,
      dedupColumn = CdcMeta.SourceTsMs)
    val replica = CdcApply.upsert(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        typed.schema),
      typed, Seq("id"), cfg)
    assert(canon(replica) == canon(t.read()), "replica diverged from source")
    // the deleted key is genuinely absent
    assert(!replica.select("id").as[Long].collect().contains(2L))
  }

  test("array and struct columns round-trip; nested temporals are refused") {
    val wh = java.nio.file.Files.createTempDirectory("graft-feed3").toString
    val b = Seq((1L, Seq(1, 2, 3), ("x", 9L), "c", 0L))
      .toDF("id", "nums", "meta", "__op", "__source_ts_ns")
    val t = ManagedTable.create(spark, wh, "nested", b.schema, Seq("id"),
      properties = Map("write.versions-retained" -> "10"))
    t.merge(b, CdcApply.UpsertConfig(keepDeletes = false))
    val env = ChangeFeed.envelopes(t, 0L, t.meta.currentVersion, "g.db.n")
      .localCheckpoint(true)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = env.collect()
    val inferred = EventDecoder.infer(
      rows.map(r => mapper.readTree(r.getString(2)).get("schema").toString).distinct.toSeq,
      Some(mapper.readTree(rows.head.getString(1)).get("schema").toString))
    val typed = EventDecoder.decode(env, inferred)
    val got = typed.select("id", "nums", "meta._1", "meta._2").collect().head
    assert(got.getLong(0) == 1L)
    assert(got.getSeq[Int](1) == Seq(1, 2, 3))
    assert(got.getString(2) == "x" && got.getLong(3) == 9L)

    // nested timestamp refused with a clear error, not a lying schema
    val b2 = Seq((1L, Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "c", 0L))
      .toDF("id", "times", "__op", "__source_ts_ns")
    val t2 = ManagedTable.create(spark, wh, "badnested", b2.schema, Seq("id"))
    t2.merge(b2, CdcApply.UpsertConfig(keepDeletes = false))
    val e = intercept[IllegalArgumentException](
      ChangeFeed.envelopes(t2, 0L, t2.meta.currentVersion, "g.db.b"))
    assert(e.getMessage.contains("nested"))
  }

  test("incremental feed: a consumer following (v, v'] windows converges identically") {
    val wh = java.nio.file.Files.createTempDirectory("graft-feed2").toString
    val t = mkSource(wh)
    var consumerState: DataFrame = null
    var lastV = 0L
    val cfg = CdcApply.UpsertConfig(keepDeletes = false,
      dedupColumn = CdcMeta.SourceTsMs)
    def consume(): Unit = {
      val to = t.meta.currentVersion
      if (to == lastV) return
      val env = ChangeFeed.envelopes(t, lastV, to, "graft.db.src").localCheckpoint(true)
      lastV = to
      if (env.isEmpty) return
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val rows = env.collect()
      val schemas = rows.map(r => mapper.readTree(r.getString(2)).get("schema").toString)
        .distinct.toSeq.sorted
      val inferred = EventDecoder.infer(schemas,
        Some(mapper.readTree(rows.head.getString(1)).get("schema").toString))
      val typed = EventDecoder.decode(env, inferred)
      consumerState =
        if (consumerState == null) CdcApply.upsert(
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            typed.schema), typed, Seq("id"), cfg)
        else CdcApply.upsert(consumerState, typed, Seq("id"), cfg)
      consumerState = consumerState.localCheckpoint(true)
    }
    merge(t, Seq((1L, "a", "2024-01-01 10:00:00", "2024-01-05", 1.5, "c", 1L)))
    consume()
    merge(t, Seq((1L, "a2", "2024-01-01 10:00:00", "2024-01-05", 2.5, "u", 2L),
      (4L, "d", "2024-01-09 01:00:00", "2024-01-09", 4.0, "c", 2L)))
    merge(t, Seq((4L, "d", "2024-01-09 01:00:00", "2024-01-09", 4.0, "d", 3L)))
    consume()
    assert(canon(consumerState) == canon(t.read()), "incremental consumer diverged")
  }
}
