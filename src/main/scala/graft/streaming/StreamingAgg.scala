package graft.streaming

import graft.tables.ManagedTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming windowed aggregation SERVED FROM A TABLE — the loop a
  * real-time dashboard closes: watermarked event-time windows
  * ([[EventTimeOps]]) maintained by Structured Streaming, each
  * micro-batch's UPDATED windows merged into a keyed [[ManagedTable]]
  * whose key is (window_start, groupCols). Late events (within the
  * watermark) re-emit their window; the merge replaces that window's
  * row, so the table always serves the latest value per window — while
  * staying a full table-layer citizen (snapshots, time travel,
  * changelog, materialized views stack on top).
  *
  * Output mode is UPDATE: only windows the batch touched flow to the
  * sink, so the per-batch merge is O(updated windows) — the same
  * O(changes) discipline as everything else in the table layer, at any
  * history length. The table's `__op` column is constant `u` (windows
  * never hard-delete; watermark expiry just stops updates).
  *
  * Exactly-once: the streaming checkpoint dedups offsets; the merge per
  * (key, batch) is idempotent (replacing a window row with the same
  * recomputed value), so a crash-replayed batch converges to the same
  * table state.
  */
object StreamingAgg {

  /** Start maintaining `table` as the tumbling-window aggregate of
    * `events`. `aggs` are named aggregate columns (e.g.
    * `sum("v").as("sum_v")`); the table must have identifier fields
    * `window_start :: groupCols`.
    */
  def tumblingIntoTable(events: DataFrame, table: ManagedTable,
                        tsCol: String, width: String, lateness: String,
                        groupCols: Seq[String], aggs: Seq[Column],
                        checkpointDir: String,
                        trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val windowed = events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        groupCols.map(col) ++: aggs.map(a => col(extractName(a))): _*)
    windowed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          table.merge(batch.withColumn("__op", lit("u")),
            graft.cdc.CdcApply.UpsertConfig(keepDeletes = false,
              runDedup = false)) // one row per window per batch already
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Start maintaining `table` as the SESSION-window aggregate of
    * `events`: gap-based sessions (a session extends while events arrive
    * within `gap` of the last one) per group key. Output mode is APPEND —
    * a session row is emitted exactly once, when the watermark passes its
    * close (Spark has merged any late extensions by then), so the serving
    * table is append-only and needs no key: every row is a FINAL session.
    * Contrast [[tumblingIntoTable]]'s update-mode merge: session windows
    * can merge/extend while open, so serving interim sessions would need
    * retractions append mode never has to express.
    *
    * Exactly-once: append is not idempotent, so the micro-batch id rides
    * the manifest commit as a replay marker (same protocol as the CDC
    * pipeline's append destinations) — a crash-replayed batch whose
    * commit landed is skipped, not duplicated.
    *
    * Scale: state is per-OPEN-session (bounded by active keys × gap, not
    * history); each batch appends only the sessions the watermark just
    * closed — O(closed sessions) per batch at any stream length.
    */
  def sessionIntoTable(events: DataFrame, table: ManagedTable,
                       tsCol: String, gap: String, lateness: String,
                       groupCols: Seq[String], aggs: Seq[Column],
                       checkpointDir: String,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val windowed = events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("session_window.start").as("session_start") +:
        col("session_window.end").as("session_end") +:
        groupCols.map(col) ++: aggs.map(a => col(extractName(a))): _*)
    windowed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val last = table.meta.properties.get(BatchIdProp).map(_.toLong).getOrElse(-1L)
          if (batchId > last)
            table.append(batch, Map(BatchIdProp -> batchId.toString))
        }
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Replay marker for the append-mode session sink. */
  val BatchIdProp = "streaming-agg.last-batch-id"

  private def extractName(c: Column): String = {
    // named aggregates only: `sum(v) AS sum_v`
    val s = c.toString
    val i = s.lastIndexOf(" AS ")
    require(i >= 0, s"aggregate needs an explicit .as(name): $s")
    s.substring(i + 4).stripPrefix("`").stripSuffix("`")
  }
}
