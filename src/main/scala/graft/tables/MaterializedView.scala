package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED incrementally-maintained aggregate — the materialized-view
  * layer over [[ManagedTable]]'s changelog: a summary table
  * (`groupCols → sum_<c>…, n_rows`) that [[refresh]] rolls forward to the
  * source's current version at O(changed keys) read and O(changed groups)
  * write, never re-aggregating the source (the batch half of what
  * Materialize/Flink call incremental view maintenance; cf.
  * [[IncrementalAgg]], which computes the rolled-forward frame without
  * persisting it).
  *
  * Refresh is EXACTLY-ONCE: the delta merges into the summary via
  * [[ManagedTable.mergeInto]] with the `mv.refreshed-version` marker
  * riding the SAME commit's pointer flip — a crash either lands both
  * (delta + marker) or neither, so a re-run can never double-apply.
  * Seeding is idempotent the same way (marker −1 until the seed commit
  * lands; a half-seeded view re-seeds from the pinned source version).
  *
  * Scale shape per refresh: one manifest-filtered changelog read
  * (O(changes)), two snapshot reads semi-joined to the changed keys (AQE
  * broadcasts trickle-sized key sets; manifest bounds prune compacted
  * sources), one partial-aggregated shuffle of the signed union, and a
  * merge whose state scan is key-range-pruned — nothing is proportional
  * to source size. Retention contract: the source must retain the
  * last-refreshed version's manifest (`write.versions-retained` ≥ the
  * refresh lag in commits), or refresh falls back to [[reseed]].
  *
  * Group columns are the summary's identifier fields and must be
  * NON-NULL in the source (coalesce a sentinel upstream if a group key
  * can be null). Sum/count only — self-decomposable under retraction;
  * min/max would need per-group recompute and are out of scope, like
  * [[IncrementalAgg]].
  */
final class MaterializedView private (
    val source: ManagedTable,
    val summary: ManagedTable,
    val groupCols: Seq[String],
    val sumCols: Seq[String]
) {

  /** Source version the summary currently reflects (−1 = seed pending). */
  def refreshedVersion: Long =
    summary.meta.properties.getOrElse(MaterializedView.VersionKey, "-1").toLong

  /** The maintained aggregate (a plain table read — no source work). */
  def read(): DataFrame = summary.read()

  // NULL sum inputs count as 0 in BOTH the seed aggregate and the delta
  // (sum_<c> is "total of coalesced values"): plain SQL SUM would go NULL
  // for an all-NULL group while the incremental add cannot distinguish
  // "no non-null values ever" without extra per-column state — coalescing
  // consistently keeps reseed() and refresh() exactly equivalent.
  private def aggOf(df: DataFrame): DataFrame = {
    val aggs = sumCols.map(c => sum(coalesce(col(c), lit(0))).as(s"sum_$c")) :+
      count(lit(1)).as("n_rows")
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full rebuild from a pinned source snapshot — the seed path, and the
    * recovery path when retention lost the last-refreshed manifest.
    */
  def reseed(): Long = {
    val v0 = source.meta.currentVersion
    // aggregate the PINNED version, not the live read: the source may
    // advance between the overwrite and the marker, and the marker must
    // describe exactly what the seed contains
    summary.overwrite(aggOf(source.readVersion(v0)))
    summary.setProperties(Map(MaterializedView.VersionKey -> v0.toString))
    v0
  }

  /** Keep the summary continuously current: follow the source's change
    * stream ([[ManagedTable.readChangeStream]]) and run [[refresh]] once
    * per micro-batch. The streamed rows are only the WAKE-UP signal —
    * refresh reads exact committed versions itself, so the file-level
    * at-least-once delivery (and the visible-before-commit crash window)
    * of the change stream cannot affect correctness; a spurious wake-up
    * is a no-op and exactly-once still comes from the marker riding the
    * delta commit. Parquet sources only (the change stream's contract).
    */
  def follow(checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    source.readChangeStream()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (_: DataFrame, _: Long) => refresh(); () }
      .trigger(trigger)
      .start()

  /** Roll the summary forward to the source's current version. Returns
    * the version now reflected. No-op when already current.
    */
  def refresh(): Long = {
    val from = refreshedVersion
    val to = source.meta.currentVersion
    if (from < 0) return reseed()
    if (to == from) return to
    // Changelog barriers: a full compact / overwrite / rollback inside
    // (from, to] rewrites state NON-incrementally (tombstones dropped,
    // old seqs re-committed), so the per-commit delta below would miss
    // retractions. The table stamps `changelog.barrier-version` at those
    // commits; crossing one falls back to a full reseed.
    val barrier = source.meta.properties
      .get(ManagedTable.BarrierKey).map(_.toLong).getOrElse(Long.MinValue)
    if (barrier > from) return reseed()
    val ids = source.meta.identifierFields
    val delta =
      try {
        val changedKeys = source.readChangesBetween(from, to)
          .select(ids.map(col): _*).distinct()
        val sign = (df: DataFrame, s: Int) => df
          .join(changedKeys, ids, "left_semi")
          .select((groupCols.map(col) ++ sumCols.map(col)) :+ lit(s).as("__sign"): _*)
        val deltaAggs = sumCols.map(c =>
          sum(coalesce(col(c), lit(0)) * col("__sign")).as(s"sum_$c")) :+
          sum(col("__sign")).as("n_rows")
        // delta rows wear the SUMMARY schema's names: for an unmatched group
        // the delta IS the new absolute value (insert), for a matched group
        // mergeInto's updateSet adds it onto the current row
        sign(source.readVersion(from), -1)
          .unionByName(sign(source.readVersion(to), 1))
          .groupBy(groupCols.map(col): _*)
          .agg(deltaAggs.head, deltaAggs.tail: _*)
      } catch {
        // retention lost the from-version manifest (refresh lag exceeded
        // write.versions-retained): the documented fallback is a rebuild
        case _: IllegalArgumentException => return reseed()
      }
    if (delta.isEmpty) {
      // nothing changed in (from, to] (metadata-only commits): advance the
      // marker alone — with no delta there is nothing a replay could
      // double-apply, so a plain property write is safe here
      summary.setProperties(Map(MaterializedView.VersionKey -> to.toString))
      return to
    }
    val updates = sumCols.map(c =>
      s"sum_$c" -> (coalesce(col(s"t.sum_$c"), lit(0)) +
        coalesce(col(s"s.sum_$c"), lit(0)))).toMap +
      ("n_rows" -> (coalesce(col("t.n_rows"), lit(0L)) + col("s.n_rows")))
    summary.mergeInto(delta,
      updateSet = updates,
      deleteWhen = Some(coalesce(col("t.n_rows"), lit(0L)) + col("s.n_rows") === 0L),
      insertWhen = Some(col("s.n_rows") > 0L),
      commitProperties = Map(MaterializedView.VersionKey -> to.toString))
    to
  }
}

object MaterializedView {

  /** Summary-table property: source version the view reflects. */
  val VersionKey = "mv.refreshed-version"
  private val GroupKey = "mv.group-cols"
  private val SumKey = "mv.sum-cols"
  private val SourceKey = "mv.source-table"

  /** Create `<name>` as a materialized `SELECT groupCols, sum(sumCols…),
    * count(*) FROM source GROUP BY groupCols` and seed it from the
    * source's current snapshot.
    */
  def create(spark: SparkSession, warehouse: String, name: String,
             source: ManagedTable, groupCols: Seq[String],
             sumCols: Seq[String]): MaterializedView = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(source.meta.identifierFields.nonEmpty,
      "materialized views need a keyed (upsert) source table")
    val schemaProbe = {
      val aggs = sumCols.map(c => sum(col(c)).as(s"sum_$c")) :+
        count(lit(1)).as("n_rows")
      source.read().groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val summary = ManagedTable.create(spark, warehouse, name,
      schemaProbe.schema, identifierFields = groupCols,
      properties = Map(
        GroupKey -> groupCols.mkString(","),
        SumKey -> sumCols.mkString(","),
        SourceKey -> source.name))
    val mv = new MaterializedView(source, summary, groupCols, sumCols)
    mv.reseed()
    mv
  }

  /** Reopen an existing view (its definition lives in the summary
    * table's properties).
    */
  def load(spark: SparkSession, warehouse: String, name: String,
           source: ManagedTable): Option[MaterializedView] =
    ManagedTable.load(spark, warehouse, name).map { summary =>
      val p = summary.meta.properties
      require(p.get(SourceKey).contains(source.name),
        s"view $name was defined over table '${p.getOrElse(SourceKey, "?")}', " +
          s"not '${source.name}'")
      new MaterializedView(source, summary,
        p(GroupKey).split(',').toSeq.filter(_.nonEmpty),
        p(SumKey).split(',').toSeq.filter(_.nonEmpty))
    }
}
