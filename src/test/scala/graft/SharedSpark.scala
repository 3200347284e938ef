package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One SparkSession per JVM for all suites (Test / fork := true). */
object SharedSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // 78 suites share this one JVM, and dead localCheckpoint/persist
    // blocks are only released when a JVM GC lets ContextCleaner see the
    // dropped RDD references (default periodic GC: 30 min — longer than
    // the whole test run). Under memory pressure that accumulation is a
    // suite-abort (OOM) risk on a slower or loaded box; a 1-minute
    // periodic GC keeps storage bounded for the cost of a few forced GCs.
    .config("spark.cleaner.periodicGC.interval", "1min")
    .getOrCreate()
}

trait SharedSpark extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = {
    val s = SharedSpark.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
