package graft.streaming

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Driver-side batch reading must mirror Spark's PERMISSIVE json reader
  * over the envelope schema — and refuse (fall back) rather than guess
  * when the input is out of contract.
  */
class EnvelopeLogSpec extends AnyFunSuite with SharedSpark {

  private def write(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), lines.mkString("\n").getBytes("UTF-8"))

  private def mkCheckpoint(batchFiles: Seq[String], batchId: Long = 0L,
                           compact: Boolean = false): String = {
    val ckpt = Files.createTempDirectory("envlog-ckpt").toString
    Files.createDirectories(Paths.get(s"$ckpt/sources/0"))
    val entries = batchFiles.map(f =>
      s"""{"path":"file://$f","timestamp":1,"batchId":$batchId}""")
    val name = if (compact) s"$batchId.compact" else batchId.toString
    write(s"$ckpt/sources/0/$name", "v1" +: entries)
    ckpt
  }

  test("parses like Spark's PERMISSIVE json: missing fields null, non-string values keep JSON text") {
    val dir = Files.createTempDirectory("envlog-in").toString
    val f = s"$dir/b0.json"
    write(f, Seq(
      """{"destination":"db.t1","key":"{\"id\":1}","value":"{\"x\":1}"}""",
      """{"destination":"db.t2","value":{"nested":{"a":[1,2]}}}""",
      """{"destination":"db.t3","key":null,"value":"v"}""",
      "", "   "))
    val ckpt = mkCheckpoint(Seq(f))
    val rows = EnvelopeLog.readBatch(spark, ckpt, 0L, 1L << 20)
      .asInstanceOf[EnvelopeLog.Rows].rows
    // Spark's own reader over the same file, same schema
    val viaSpark = spark.read.schema(CdcPipeline.envelopeSchema).json(f).collect()
    def norm(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1).toSeq
    assert(norm(rows) == norm(viaSpark))
    assert(rows.length == 3) // blank lines skipped
  }

  test("a .compact log filters to the batch's own entries") {
    val dir = Files.createTempDirectory("envlog-in2").toString
    val f0 = s"$dir/b0.json"; val f1 = s"$dir/b1.json"
    write(f0, Seq("""{"destination":"old","key":"k","value":"v"}"""))
    write(f1, Seq("""{"destination":"new","key":"k","value":"v"}"""))
    val ckpt = Files.createTempDirectory("envlog-ckpt2").toString
    Files.createDirectories(Paths.get(s"$ckpt/sources/0"))
    write(s"$ckpt/sources/0/1.compact", Seq("v1",
      s"""{"path":"file://$f0","timestamp":1,"batchId":0}""",
      s"""{"path":"file://$f1","timestamp":2,"batchId":1}"""))
    val rows = EnvelopeLog.readBatch(spark, ckpt, 1L, 1L << 20)
      .asInstanceOf[EnvelopeLog.Rows].rows
    assert(rows.map(_.getString(0)).toSeq == Seq("new"))
  }

  test("fallback signals: oversized batch is TooLarge; unreadable layout is Unknown") {
    val dir = Files.createTempDirectory("envlog-in3").toString
    val f = s"$dir/b0.json"
    write(f, Seq("""{"destination":"d","key":"k","value":"v"}"""))
    val ckpt = mkCheckpoint(Seq(f))
    assert(EnvelopeLog.readBatch(spark, ckpt, 0L, maxBytes = 1L) == EnvelopeLog.TooLarge)
    // missing log file for the batch
    assert(EnvelopeLog.readBatch(spark, ckpt, 7L, 1L << 20) == EnvelopeLog.Unknown)
    // header mismatch
    val ckpt2 = Files.createTempDirectory("envlog-ckpt3").toString
    Files.createDirectories(Paths.get(s"$ckpt2/sources/0"))
    write(s"$ckpt2/sources/0/0", Seq("v99", "{}"))
    assert(EnvelopeLog.readBatch(spark, ckpt2, 0L, 1L << 20) == EnvelopeLog.Unknown)
    // unparseable data file → Unknown (the distributed path reproduces
    // Spark's own malformed-row semantics instead of us guessing)
    val fBad = s"$dir/bad.json"
    write(fBad, Seq("""{"destination": """))
    val ckpt3 = mkCheckpoint(Seq(fBad))
    assert(EnvelopeLog.readBatch(spark, ckpt3, 0L, 1L << 20) == EnvelopeLog.Unknown)
  }
}
