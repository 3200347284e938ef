package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round helper: dump `.explain("formatted")` for the named
  * queries (or every query) to `<outDir>/<name>_<tag>.txt`.
  *
  *   sbt "runMain graft.PlanDump <outDir> <tag> [q1,q2,...] [sfDir]"
  *
  * Capturing the formatted plan goes through queryExecution directly —
  * no job for the CAPTURE itself, but queries whose construction
  * materializes shared intermediates eagerly (BM25, semantic dedup, LSH
  * pairs, connected components, MV refresh) run those jobs before the
  * plan exists, so dumping them is not free on a loaded box (ADVICE r11).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2 && args(2).nonEmpty && args(2) != "all")
        Some(args(2).split(",").map(_.trim).toSet)
      else None
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
          println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
