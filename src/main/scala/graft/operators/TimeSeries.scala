package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization over event logs: resampling to a fixed
  * grain with gap filling + forward fill, and gaps-and-islands run
  * detection. The capabilities a feature/metrics pipeline needs before an
  * irregular event stream can feed anything that assumes a dense time
  * axis (rate limiting, trend features, training-label alignment).
  *
  * Scale shape (100 TB event log):
  *  - the ONLY pass over the raw events is the grain aggregation — one
  *    hash shuffle on (key, bucket), map-side partial aggs;
  *  - everything after runs on the aggregated series (|keys| × |buckets|
  *    rows — bounded by key count times calendar span, not event count);
  *  - the grid is generated per key with `sequence` + `explode` — a
  *    map-side array unroll, never a driver loop or a cross join against
  *    a calendar table;
  *  - forward fill is a per-key running `last(ignoreNulls)` window — one
  *    shuffle on key, frame bounded-preceding so Spark streams it.
  */
object TimeSeries {

  /** Aggregate `df` to `grain` buckets per key, then densify: one output
    * row for EVERY bucket between each key's first and last active
    * bucket. Silent buckets get zero counts and null aggregates;
    * `fillCols` are additionally carried forward from the most recent
    * active bucket (`<name>_ffill`).
    *
    * @param aggs     bucket-level aggregates, already aliased; must be
    *                 deterministic and engine-exact (counts, min/max,
    *                 decimal sums) if the result feeds a cross-engine
    *                 comparison
    * @param fillCols subset of agg aliases to forward-fill
    */
  def resampleWithFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      grain: String,
      aggs: Seq[Column],
      fillCols: Seq[String]): DataFrame = {
    val bucketed = df
      .groupBy(col(keyCol), date_trunc(grain, col(tsCol)).as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
    // per-key span: runs on the aggregated series, not the raw events
    val span = bucketed.groupBy(keyCol)
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"),
        expr(s"interval 1 $grain"))).as("bucket"))
    val joined = grid
      .join(bucketed.withColumn("observed", lit(true)),
        Seq(keyCol, "bucket"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(false)))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_ffill", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Gaps-and-islands: collapse each key's consecutive active buckets
    * into maximal runs. A bucket is "active" iff the key has at least one
    * event in it. Classic grouping key: bucket ordinal minus the per-key
    * row number is constant within a run. Output: one row per island with
    * its start, end and length in buckets.
    *
    * One distinct shuffle on (key, bucket) + one window shuffle on key;
    * the raw event scan is aggregated away in the first exchange.
    */
  def activityIslands(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      grain: String = "day"): DataFrame = {
    require(grain == "day", s"activityIslands supports day grain (got $grain)")
    val active = df
      .select(col(keyCol), to_date(date_trunc(grain, col(tsCol))).as("day"))
      .distinct()
    val w = Window.partitionBy(keyCol).orderBy("day")
    active
      .withColumn("__grp", datediff(col("day"), lit("1970-01-01").cast("date"))
        - row_number().over(w))
      .groupBy(col(keyCol), col("__grp"))
      .agg(min("day").as("island_start"), max("day").as("island_end"),
        count(lit(1)).cast("long").as("days"))
      .drop("__grp")
  }
}
