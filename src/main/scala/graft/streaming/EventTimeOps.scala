package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming aggregations with watermark-driven state eviction —
  * the T5 surface the reference lacks entirely (SURVEY §2.7: it handles
  * late data only by last-write-wins upsert) but a Spark-native engine gets
  * from Structured Streaming. All helpers work identically on batch
  * DataFrames (Spark ignores the watermark there), so one code path serves
  * both the oracle-checked batch queries and the streaming pipeline.
  *
  * Scale notes: windowed aggregation state is partitioned by (window, keys)
  * — the shuffle is the same hash exchange a batch groupBy pays; the
  * watermark bounds state size, which is what makes unbounded streams
  * feasible at all. Late rows beyond the watermark are dropped (documented
  * Structured Streaming semantics), mirroring "allowed lateness" designs.
  */
object EventTimeOps {

  /** Tumbling event-time windows: one aggregation state per
    * (window, keys) group, evicted once the watermark passes window end.
    */
  def tumbling(df: DataFrame, tsCol: String, width: String, lateness: String,
               keys: Seq[String], aggs: Seq[Column]): DataFrame =
    flattenWindow("window", "w_start", "w_end",
      df.withWatermark(tsCol, lateness)
        .groupBy(window(col(tsCol), width) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Sliding windows (width, slide). */
  def sliding(df: DataFrame, tsCol: String, width: String, slide: String,
              lateness: String, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    flattenWindow("window", "w_start", "w_end",
      df.withWatermark(tsCol, lateness)
        .groupBy(window(col(tsCol), width, slide) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Session windows: gap-based, merged by Spark's native session_window
    * (state merges adjacent sessions — the streaming analogue of the
    * batch sessionize query in [[graft.Queries]]).
    */
  def sessionized(df: DataFrame, tsCol: String, gap: String, lateness: String,
                  keys: Seq[String], aggs: Seq[Column]): DataFrame =
    flattenWindow("session_window", "s_start", "s_end",
      df.withWatermark(tsCol, lateness)
        .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
        .agg(aggs.head, aggs.tail: _*))

  private def flattenWindow(winCol: String, startAs: String, endAs: String,
                            agged: DataFrame): DataFrame =
    agged.select(col(s"$winCol.start").as(startAs) +: col(s"$winCol.end").as(endAs) +:
      agged.columns.filterNot(_ == winCol).map(col).toSeq: _*)

  /** Watermarked stream-stream interval join: each left row pairs with
    * right rows of the same key whose timestamp lies in
    * [left.ts − before, left.ts + after]. Both sides carry watermarks, so
    * Spark evicts join state once the watermark clears a row's interval —
    * bounded state on unbounded streams, the enrichment shape (click ×
    * purchase attribution, event × metric correlation) that the
    * reference's single-table upsert model cannot express at all.
    *
    * Right columns are prefixed to avoid collisions. Works on batch
    * frames too (watermarks ignored), so the semantics are unit-testable
    * without a streaming harness and e2e-tested with one.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   before: String, after: String, lateness: String,
                   rightPrefix: String = "r_"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r0 = right.withWatermark(rightTs, lateness)
    val clash = left.columns.toSet
      .intersect(right.columns.map(c => s"$rightPrefix$c").toSet)
    require(clash.isEmpty,
      s"left columns collide with prefixed right columns: ${clash.mkString(",")} " +
        s"— pass a different rightPrefix")
    val r = r0.columns.foldLeft(r0)((d, c) => d.withColumnRenamed(c, s"$rightPrefix$c"))
    val rKey = col(s"$rightPrefix$key")
    val rTs = col(s"$rightPrefix$rightTs")
    l.join(r,
      col(key) === rKey &&
        rTs >= col(leftTs) - expr(s"INTERVAL $before") &&
        rTs <= col(leftTs) + expr(s"INTERVAL $after"),
      "inner")
  }
}
