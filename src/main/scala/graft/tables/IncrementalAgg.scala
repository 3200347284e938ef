package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped sum/count aggregate over a MoR
  * table's changelog — the materialized-view pattern: a downstream
  * aggregate follows an upserted table at O(changed keys) per refresh
  * instead of re-aggregating O(table).
  *
  * The changelog yields the CHANGED KEYS between two versions
  * ([[ManagedTable.readChangesBetween]], manifest-filtered — O(changes)).
  * Retractions need those keys' PRIOR rows, so the refresh reads the old
  * and new snapshots semi-joined to the changed-key set (no forced
  * broadcast: a trickle refresh's key set is batch-sized and AQE turns
  * the semi-join into a broadcast at runtime, while a backfill-sized
  * window falls back to a shuffled join instead of OOMing the driver;
  * manifest bounds prune the snapshot scans of a compacted table).
  * Before-rows contribute with sign −1, after-rows with +1; one partial
  * -aggregated shuffle of the signed union produces the per-group delta,
  * which outer-merges onto the previous aggregate state. Groups whose
  * row count reaches zero drop out. Updates that MOVE a row across
  * groups are handled naturally (−1 in the old group, +1 in the new).
  *
  * Sum/count are self-decomposable, which is what makes the merge a pure
  * column add; min/max would need per-group recompute on retraction and
  * are deliberately out of scope.
  */
object IncrementalAgg {

  /** Bootstrap: the full aggregate of the table's current state.
    * Output columns: groupCols ++ sumCols.map("sum_" + _) :+ "n_rows".
    */
  def fullAgg(table: ManagedTable, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    aggregate(table.read(), groupCols, sumCols)

  /** Roll `oldAgg` (the aggregate as of `fromVersion`) forward to
    * `toVersion` using only the rows that changed in between.
    */
  def maintain(table: ManagedTable, fromVersion: Long, toVersion: Long,
               oldAgg: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val ids = table.meta.identifierFields
    require(ids.nonEmpty, "incremental maintenance needs identifier fields")
    val changedKeys = table.readChangesBetween(fromVersion, toVersion)
      .select(ids.map(col): _*).distinct()
    val sign = (df: DataFrame, s: Int) => df
      .join(changedKeys, ids, "left_semi")
      .select((groupCols.map(col) ++ sumCols.map(col)) :+ lit(s).as("__sign"): _*)
    val before = sign(table.readVersion(fromVersion), -1)
    val after = sign(table.readVersion(toVersion), 1)
    val deltaAggs = sumCols.map(c =>
      sum(col(c) * col("__sign")).as(s"__d_sum_$c")) :+
      sum(col("__sign")).as("__d_n")
    val delta = before.unionByName(after)
      .groupBy(groupCols.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    // null-safe group equality: a NULL group key must merge its old and
    // delta sides like any other group, not split into two partial rows
    val joinCond = groupCols.map(c => oldAgg(c) <=> delta(c)).reduce(_ && _)
    val merged = oldAgg.join(delta, joinCond, "full_outer")
      .select(groupCols.map(c => coalesce(oldAgg(c), delta(c)).as(c)) ++
        sumCols.map(c => (coalesce(col(s"sum_$c"), lit(0)) +
          coalesce(col(s"__d_sum_$c"), lit(0))).as(s"sum_$c")) :+
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__d_n"), lit(0L))).as("n_rows"): _*)
    merged.filter(col("n_rows") > 0)
  }

  private def aggregate(df: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(s"sum_$c")) :+
      count(lit(1)).as("n_rows")
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
