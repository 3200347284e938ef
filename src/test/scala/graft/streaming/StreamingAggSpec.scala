package graft.streaming

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** [[StreamingAgg.tumblingIntoTable]] — the streaming-aggregate serving
  * table: windows land keyed by (window_start, group), late events within
  * the watermark REPLACE their window's row, and restarts resume from the
  * checkpoint with the table converging to the batch recompute.
  */
class StreamingAggSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("k", StringType),
    StructField("v", LongType)))

  private def writeWave(dir: String, name: String, rows: Seq[(String, String, Long)]): Unit = {
    val lines = rows.map { case (ts, k, v) =>
      s"""{"ts":"$ts","k":"$k","v":$v}"""
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("windows merge into the table; late data replaces; restart resumes") {
    val in = java.nio.file.Files.createTempDirectory("graft-sagg-in").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sagg-ck").toString
    val wh = java.nio.file.Files.createTempDirectory("graft-sagg-wh").toString
    val tblSchema = StructType(Seq(
      StructField("window_start", TimestampType), StructField("window_end", TimestampType),
      StructField("k", StringType), StructField("sum_v", LongType),
      StructField("__op", StringType)))
    val table = ManagedTable.create(spark, wh, "win_agg", tblSchema,
      identifierFields = Seq("window_start", "k"))

    def runPass(): Unit = {
      val events = spark.readStream.schema(schema).json(in)
      val q = StreamingAgg.tumblingIntoTable(events, table,
        "ts", "10 minutes", "5 minutes", Seq("k"),
        Seq(org.apache.spark.sql.functions.sum("v").as("sum_v")), ck)
      q.awaitTermination(120000)
    }
    def state(): Seq[(String, String, Long)] =
      table.read().select("window_start", "k", "sum_v").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq

    writeWave(in, "w1.json", Seq(
      ("2024-01-01 10:00:30", "a", 1L),
      ("2024-01-01 10:02:00", "a", 2L),
      ("2024-01-01 10:11:00", "a", 4L)))
    runPass()
    assert(state() == Seq(
      ("2024-01-01 10:00:00.0", "a", 3L),
      ("2024-01-01 10:10:00.0", "a", 4L)), s"after wave 1: ${state()}")

    // a late event inside the watermark must REPLACE its window's row;
    // a new window appears; a second group starts
    writeWave(in, "w2.json", Seq(
      ("2024-01-01 10:03:00", "a", 10L), // late into [10:00, 10:10)
      ("2024-01-01 10:21:00", "a", 7L),
      ("2024-01-01 10:21:30", "b", 5L)))
    runPass() // same checkpoint: resumes, processes only wave 2
    assert(state() == Seq(
      ("2024-01-01 10:00:00.0", "a", 13L),
      ("2024-01-01 10:10:00.0", "a", 4L),
      ("2024-01-01 10:20:00.0", "a", 7L),
      ("2024-01-01 10:20:00.0", "b", 5L)), s"after wave 2: ${state()}")

    // the serving table is a full table-layer citizen: snapshots exist
    assert(table.versions().nonEmpty)
  }

  test("session windows append FINAL sessions once the watermark closes them; replay-safe") {
    val in = java.nio.file.Files.createTempDirectory("graft-sess-in").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-sess-ck").toString
    val wh = java.nio.file.Files.createTempDirectory("graft-sess-wh").toString
    val tblSchema = StructType(Seq(
      StructField("session_start", TimestampType), StructField("session_end", TimestampType),
      StructField("k", StringType), StructField("n", LongType),
      StructField("sum_v", LongType)))
    val table = ManagedTable.create(spark, wh, "sess_agg", tblSchema,
      identifierFields = Seq.empty) // append-only: every row is a final session

    def runPass(): Unit = {
      val events = spark.readStream.schema(schema).json(in)
      val q = StreamingAgg.sessionIntoTable(events, table,
        "ts", "1 minute", "5 minutes", Seq("k"),
        Seq(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("v").as("sum_v")), ck)
      q.awaitTermination(120000)
    }
    def state(): Seq[(String, String, String, Long, Long)] =
      table.read().collect().map(r => (r.getTimestamp(0).toString,
        r.getTimestamp(1).toString, r.getString(2), r.getLong(3), r.getLong(4)))
        .sortBy(t => (t._3, t._1)).toSeq

    // two sessions for 'a': a 2-event run (gap-extended) and a lone event
    writeWave(in, "w1.json", Seq(
      ("2024-01-01 10:00:00", "a", 1L),
      ("2024-01-01 10:00:30", "a", 2L),
      ("2024-01-01 10:30:00", "a", 4L)))
    runPass()
    // a much later wave advances the watermark past both sessions
    writeWave(in, "w2.json", Seq(("2024-01-01 11:00:00", "b", 9L)))
    runPass()
    val afterClose = state()
    assert(afterClose == Seq(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:01:30.0", "a", 2L, 3L),
      ("2024-01-01 10:30:00.0", "2024-01-01 10:31:00.0", "a", 1L, 4L)),
      s"closed sessions: $afterClose")
    // b's session is still open (watermark has not passed it) — not served
    assert(!afterClose.exists(_._3 == "b"))
    // replay safety: re-running with the same checkpoint adds nothing
    runPass()
    assert(state() == afterClose)
    // the replay marker rode the append commits
    assert(table.meta.properties.contains(StreamingAgg.BatchIdProp))
  }
}
