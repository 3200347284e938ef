package graft.ops

import graft.SharedSpark
import graft.operators.TimeSeries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def ev(rows: (Long, String, Double)*) =
    rows.toSeq.toDF("k", "ts_s", "v")
      .select(col("k"), col("ts_s").cast("timestamp").as("ts"), col("v"))

  test("resampleWithFill densifies the grid, zeroes silent days, carries the fill column") {
    // key 1 active on Jan 1 (two events) and Jan 4; Jan 2-3 silent.
    // key 2 active on a single day only.
    val df = ev(
      (1L, "2024-01-01 03:00:00", 10.0), (1L, "2024-01-01 20:00:00", 4.0),
      (1L, "2024-01-04 12:00:00", 7.0),
      (2L, "2024-02-10 00:30:00", 99.0))
    val out = TimeSeries.resampleWithFill(df, "k", "ts", "day",
        aggs = Seq(count(lit(1)).cast("long").as("n"), max("v").as("vmax")),
        fillCols = Seq("vmax"))
      .select(col("k"), date_format(col("bucket"), "yyyy-MM-dd").as("d"),
        coalesce(col("n"), lit(0L)).as("n"), col("observed"), col("vmax_ffill"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4))).toSet
    assert(out === Set(
      (1L, "2024-01-01", 2L, true, 10.0),
      (1L, "2024-01-02", 0L, false, 10.0), // silent: zero count, carried max
      (1L, "2024-01-03", 0L, false, 10.0),
      (1L, "2024-01-04", 1L, true, 7.0),
      (2L, "2024-02-10", 1L, true, 99.0)))
  }

  test("resampleWithFill output size = per-key span, independent of event count") {
    val many = (1 to 500).map(i => (1L, s"2024-01-0${i % 3 + 1} 0${i % 9}:00:00", i.toDouble))
    val out = TimeSeries.resampleWithFill(ev(many: _*), "k", "ts", "day",
      aggs = Seq(count(lit(1)).as("n")), fillCols = Seq.empty)
    assert(out.count() === 3) // Jan 1..3, one row per day, 500 events in
  }

  test("activityIslands collapses consecutive days into maximal runs") {
    val df = ev(
      (1L, "2024-01-01 01:00:00", 0.0), (1L, "2024-01-02 01:00:00", 0.0),
      (1L, "2024-01-02 23:00:00", 0.0), // same day twice — still one bucket
      (1L, "2024-01-03 01:00:00", 0.0),
      (1L, "2024-01-07 01:00:00", 0.0), (1L, "2024-01-08 01:00:00", 0.0),
      (2L, "2024-03-05 09:00:00", 0.0))
    val out = TimeSeries.activityIslands(df, "k", "ts")
      .select(col("k"), date_format(col("island_start"), "yyyy-MM-dd"),
        date_format(col("island_end"), "yyyy-MM-dd"), col("days"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(out === Set(
      (1L, "2024-01-01", "2024-01-03", 3L),
      (1L, "2024-01-07", "2024-01-08", 2L),
      (2L, "2024-03-05", "2024-03-05", 1L)))
  }

  test("activityIslands ≡ naive per-key scan on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(5).toLong, f"2024-01-${rnd.nextInt(28) + 1}%02d 12:00:00", 0.0)
    }
    val got = TimeSeries.activityIslands(ev(rows: _*), "k", "ts")
      .select(col("k"), date_format(col("island_start"), "yyyy-MM-dd"),
        date_format(col("island_end"), "yyyy-MM-dd"), col("days"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // naive: sort each key's distinct days, split on non-consecutive
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2.take(10)).distinct.sorted)
    val want = byKey.toSeq.flatMap { case (k, days) =>
      val d = days.map(java.time.LocalDate.parse)
      val runs = d.foldLeft(List.empty[List[java.time.LocalDate]]) {
        case (acc @ (h :: t), day) if h.nonEmpty && h.head.plusDays(1) == day =>
          (day :: h) :: t
        case (acc, day) => List(day) :: acc
      }
      runs.map(r => (k, r.last.toString, r.head.toString, r.size.toLong))
    }.toSet
    assert(got === want)
  }
}
