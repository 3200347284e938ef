package graft.streaming

import graft.SharedSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventTimeOpsSpec extends AnyFunSuite with SharedSpark {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("batch: tumbling windows match a manual groupBy(window)") {
    import spark.implicits._
    val df = Seq((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(31), "a", 3.0), (ts(2), "b", 4.0))
      .toDF("ts", "k", "v")
    val out = EventTimeOps.tumbling(df, "ts", "30 minutes", "10 minutes",
      Seq("k"), Seq(sum("v").as("sv"), count(lit(1)).as("n")))
      .orderBy("k", "w_start").collect()
    assert(out.map(r => (r.getAs[String]("k"), r.getAs[Double]("sv"), r.getAs[Long]("n"))).toSeq ==
      Seq(("a", 3.0, 2L), ("a", 3.0, 1L), ("b", 4.0, 1L)))
  }

  test("batch: sliding windows assign each row to width/slide windows") {
    import spark.implicits._
    val df = Seq((ts(5), "a", 1.0)).toDF("ts", "k", "v")
    val out = EventTimeOps.sliding(df, "ts", "30 minutes", "10 minutes", "0 seconds",
      Seq("k"), Seq(sum("v").as("sv")))
      .orderBy("w_start").collect()
    // one row at 10:05 lands in windows starting 09:40, 09:50, 10:00
    assert(out.length == 3)
    assert(out.map(_.getAs[java.sql.Timestamp]("w_start").toString).toSeq ==
      Seq("2024-01-01 09:40:00.0", "2024-01-01 09:50:00.0", "2024-01-01 10:00:00.0"))
    assert(out.forall(_.getAs[Double]("sv") == 1.0))
  }

  test("batch: session windows merge rows within the gap") {
    import spark.implicits._
    val df = Seq((ts(1), "u"), (ts(3), "u"), (ts(30), "u"), (ts(1), "w"))
      .toDF("ts", "k")
    val out = EventTimeOps.sessionized(df, "ts", "10 minutes", "0 seconds",
      Seq("k"), Seq(count(lit(1)).as("n")))
      .orderBy("k", "s_start").collect()
    // u: [1,3] merge into one session; 30 is its own; w: one session
    assert(out.map(r => (r.getAs[String]("k"), r.getAs[Long]("n"))).toSeq ==
      Seq(("u", 2L), ("u", 1L), ("w", 1L)))
  }

  test("streaming: watermark closes tumbling windows, late rows beyond it are dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventTimeOps.tumbling(mem.toDF().toDF("ts", "k", "v"),
      "ts", "10 minutes", "5 minutes", Seq("k"), Seq(sum("v").as("sv")))
    val q = agg.writeStream.format("memory").queryName("etops")
      .outputMode("append").start()
    try {
      mem.addData((ts(1), "a", 1.0), (ts(2), "a", 2.0))
      q.processAllAvailable()
      // watermark still at 0 — nothing emitted yet in append mode
      assert(spark.table("etops").count() == 0)
      // advance event time well past window [10:00,10:10) + 5m lateness
      mem.addData((ts(30), "a", 9.0))
      q.processAllAvailable()
      mem.addData((ts(45), "a", 1.0)) // push watermark past 10:30 window too? (10:45-5m=10:40 > 10:40? no)
      q.processAllAvailable()
      val closed = spark.table("etops").collect()
        .map(r => (r.getAs[Timestamp]("w_start").toString, r.getAs[Double]("sv")))
      assert(closed.contains(("2024-01-01 10:00:00.0", 3.0)), closed.mkString(","))
      // a row older than the watermark is dropped, not re-emitted
      mem.addData((ts(3), "a", 100.0))
      q.processAllAvailable()
      val after = spark.table("etops").collect()
        .filter(_.getAs[Timestamp]("w_start").toString == "2024-01-01 10:00:00.0")
      assert(after.map(_.getAs[Double]("sv")).toSeq == Seq(3.0))
    } finally q.stop()
  }

  test("batch: interval join pairs same-key rows within [ts-before, ts+after]") {
    import spark.implicits._
    val clicks = Seq((ts(10), "u1", "c1"), (ts(40), "u1", "c2"), (ts(10), "u2", "c3"))
      .toDF("ts", "uid", "click")
    val buys = Seq((ts(15), "u1", "p1"), (ts(39), "u1", "p2"), (ts(30), "u2", "p3"))
      .toDF("ts", "uid", "buy")
    val j = EventTimeOps.intervalJoin(clicks, buys, "uid", "ts", "ts",
      before = "0 minutes", after = "10 minutes", lateness = "0 seconds")
    val pairs = j.select("click", "r_buy").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // c1@10:10 matches p1@10:15 (within +10m); c2@10:40 matches nothing
    // after it; u2's buy at 10:30 is 20m after c3 — out of range
    assert(pairs == Set(("c1", "p1")))
    val sym = EventTimeOps.intervalJoin(clicks, buys, "uid", "ts", "ts",
      before = "5 minutes", after = "5 minutes", lateness = "0 seconds")
      .select("click", "r_buy").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(sym == Set(("c1", "p1"), ("c2", "p2")))
  }

  test("streaming: interval join emits matches and bounds state by watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val lmem = MemoryStream[(Timestamp, String, String)]
    val rmem = MemoryStream[(Timestamp, String, String)]
    val j = EventTimeOps.intervalJoin(
      lmem.toDF().toDF("ts", "uid", "click"),
      rmem.toDF().toDF("ts", "uid", "buy"),
      "uid", "ts", "ts", before = "0 minutes", after = "10 minutes",
      lateness = "5 minutes")
    val q = j.selectExpr("click", "r_buy").writeStream
      .format("memory").queryName("ij").outputMode("append").start()
    try {
      lmem.addData((ts(10), "u1", "c1"))
      rmem.addData((ts(15), "u1", "p1"))
      q.processAllAvailable()
      assert(spark.table("ij").collect().map(r => (r.getString(0), r.getString(1))).toSet ==
        Set(("c1", "p1")))
      // a right row far outside every live interval joins nothing
      rmem.addData((ts(55), "u1", "p9"))
      q.processAllAvailable()
      assert(spark.table("ij").count() == 1)
      // state was bounded: metrics report watermark-driven removal keys
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty)
    } finally q.stop()
  }
}
