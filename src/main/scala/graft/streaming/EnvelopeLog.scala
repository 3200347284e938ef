package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import scala.util.control.NonFatal

/** Driver-side reader for a file-source micro-batch's envelope files.
  *
  * The file stream source records each batch's added files in its
  * checkpoint log (`sources/0/<batchId>`, entries tagged with the batch
  * id) BEFORE foreachBatch runs — so for a small batch the driver can
  * learn the file list and byte size without a job, and read the
  * envelope JSON lines itself. Parsing mirrors Spark's PERMISSIVE json
  * reader over the all-string envelope schema: missing fields are null,
  * non-string values keep their JSON text. Anything unexpected — a log
  * that can't be read, a line that can't be parsed, too many bytes —
  * returns None and the caller falls back to the distributed path, which
  * reproduces Spark's own malformed-input semantics exactly.
  */
private[streaming] object EnvelopeLog {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  sealed trait Result
  /** The whole batch, driver-read. */
  final case class Rows(rows: Array[Row]) extends Result
  /** Known to exceed the byte threshold — the caller can skip the row
    * probe too, the batch is certainly large. */
  case object TooLarge extends Result
  /** Log unreadable/unexpected — size unknown, caller decides. */
  case object Unknown extends Result

  /** The batch's envelope rows, [[TooLarge]] when the files are known to
    * exceed `maxBytes`, or [[Unknown]] when the log can't be used
    * (unexpected layout, parse failure).
    */
  def readBatch(spark: SparkSession, checkpointDir: String, batchId: Long,
                maxBytes: Long): Result =
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val logDir = new Path(s"$checkpointDir/sources/0")
      val logFs = logDir.getFileSystem(conf)
      val candidates = Seq(new Path(logDir, batchId.toString),
        new Path(logDir, s"$batchId.compact"))
      val logPath = candidates.find(logFs.exists).getOrElse(return Unknown)
      val lines = {
        val in = logFs.open(logPath)
        try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq
        finally in.close()
      }
      if (lines.isEmpty || lines.head.trim != "v1") return Unknown
      val files = lines.tail.filter(_.trim.nonEmpty).flatMap { l =>
        val n = mapper.readTree(l)
        // a .compact log holds the whole history; this batch's additions
        // are the entries stamped with its id
        if (n.get("batchId").asLong == batchId)
          Some(new Path(new java.net.URI(n.get("path").asText)))
        else None
      }
      if (files.isEmpty) return Unknown
      val fss = files.map(f => f -> f.getFileSystem(conf))
      if (fss.map { case (f, fs) => fs.getFileStatus(f).getLen }.sum > maxBytes)
        return TooLarge
      Rows(fss.iterator.flatMap { case (f, fs) =>
        val in = fs.open(f)
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        text.split("\n").iterator.filter(_.trim.nonEmpty).map { line =>
          val n = mapper.readTree(line)
          def s(field: String): String = {
            val v = n.get(field)
            if (v == null || v.isNull) null
            else if (v.isTextual) v.textValue()
            else v.toString
          }
          Row(s("destination"), s("key"), s("value"))
        }
      }.toArray)
    } catch { case NonFatal(_) => Unknown }
}
