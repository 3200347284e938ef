package graft

import org.apache.spark.sql.SparkSession

/** Plan-iteration helper: run ONE inventory query against a testdata dir,
  * print wall time and (optionally) the formatted physical plan.
  *
  *   sbt "runMain graft.RunOne <query> [sfDir] [explain]"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val doExplain = args.contains("explain")
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
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    // "jobs": per-run Spark job accounting — count + total job wall vs
    // query wall, and the slowest jobs by description. The gap between
    // query wall and summed job wall is driver-side work (planning,
    // commit protocol, FS metadata).
    val doJobs = args.contains("jobs")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    if (doJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (Option(e.properties.getProperty("spark.job.description"))
            .orElse(Option(e.properties.getProperty("callSite.short"))).getOrElse(""),
            e.time))
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          done.put(e.jobId, e.time)
      })
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val doPhases = args.contains("phases")
    (1 to runs).foreach { i =>
      jobs.clear(); done.clear()
      if (doPhases) graft.tables.PhaseTimer.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name run$i: $wall%.2f s")
      if (doPhases) println(graft.tables.PhaseTimer.report())
      if (doJobs) {
        import scala.jdk.CollectionConverters._
        val rows = jobs.asScala.toSeq.flatMap { case (id, (desc, t0j)) =>
          Option(done.get(id)).filter(_ > 0).map(t1 => (id, desc, (t1 - t0j) / 1e3))
        }.sortBy(-_._3)
        val sum = rows.map(_._3).sum
        println(f"[runone]   jobs=${rows.size} jobwall=$sum%.2f s driverGap=${wall - sum}%.2f s")
        rows.take(15).foreach { case (id, desc, s) =>
          println(f"[runone]   job$id%4d $s%6.3f s  ${desc.take(100)}")
        }
      }
    }
    spark.stop()
  }
}
