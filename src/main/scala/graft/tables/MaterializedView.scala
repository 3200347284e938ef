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
  * can be null).
  *
  * Two aggregate classes, maintained differently per refresh:
  *  - `sumCols` (plus the implicit `n_rows`): self-decomposable under
  *    retraction — maintained from the signed key-level delta alone,
  *    never touching unchanged rows.
  *  - `maxCols` / `minCols` / `distinctCols` (`max_<c>`, `min_<c>`,
  *    exact `nd_<c>`): NOT retractable (a deleted max can't be
  *    subtracted), so they recompute per CHANGED GROUP from the target
  *    snapshot — the standard IVM fallback. Cost stays O(rows of changed
  *    groups): the recompute scan is semi-joined to the changed group
  *    set (runtime-broadcast, filtered map-side), the same scan envelope
  *    as the signed delta; unchanged groups are never touched.
  */
final class MaterializedView private (
    val source: ManagedTable,
    val summary: ManagedTable,
    val groupCols: Seq[String],
    val sumCols: Seq[String],
    val maxCols: Seq[String] = Seq.empty,
    val minCols: Seq[String] = Seq.empty,
    val distinctCols: Seq[String] = Seq.empty
) {

  private def recomputeCols: Seq[String] =
    maxCols.map(c => s"max_$c") ++ minCols.map(c => s"min_$c") ++
      distinctCols.map(c => s"nd_$c")

  private def recomputeAggs: Seq[org.apache.spark.sql.Column] =
    maxCols.map(c => max(col(c)).as(s"max_$c")) ++
      minCols.map(c => min(col(c)).as(s"min_$c")) ++
      distinctCols.map(c => count_distinct(col(c)).as(s"nd_$c"))

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
    val aggs = (sumCols.map(c => sum(coalesce(col(c), lit(0))).as(s"sum_$c")) :+
      count(lit(1)).as("n_rows")) ++ recomputeAggs
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

  /** Keep the summary continuously current: follow the source's COMMIT
    * stream ([[ManagedTable.commitStream]] — one row per new manifest,
    * round 8: metadata-only commits like a region delete or truncate
    * wake the refresh too, where the old data-file stream slept through
    * them and the summary served stale rows until an unrelated write)
    * and run [[refresh]] once per micro-batch. The streamed rows are
    * only the WAKE-UP signal — refresh reads exact committed versions
    * itself, so the file source's at-least-once delivery cannot affect
    * correctness; a spurious wake-up is a no-op and exactly-once still
    * comes from the marker riding the delta commit.
    */
  def follow(checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    source.commitStream()
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
        // The delta feeds several consumers — the emptiness probe below,
        // mergeInto's bounded trickle probe, its key-range pruning agg,
        // and the merge join itself — and Spark re-executes shared
        // subtrees per consumer: unmaterialized, the two-snapshot scan +
        // signed aggregation ran up to four times per refresh.
        // Materialize it once (round 11): the delta is O(changed groups)
        // by this class's own contract — the designed-small intermediate.
        val signedDelta0 = sign(source.readVersion(from), -1)
          .unionByName(sign(source.readVersion(to), 1))
          .groupBy(groupCols.map(col): _*)
          .agg(deltaAggs.head, deltaAggs.tail: _*)
        if (recomputeCols.isEmpty) signedDelta0.localCheckpoint(true)
        else {
          // the delta (changed-group-sized) feeds three consumers below —
          // the recompute's group semi-join, the outer join, and the
          // merge source; materialize it once instead of re-running the
          // two-snapshot scan per consumer
          val signedDelta = signedDelta0.localCheckpoint(true)
          // non-retractable aggregates: recompute per CHANGED GROUP from
          // the target snapshot. The delta's groups ARE the changed group
          // set (every group a changed key's row touched at either
          // version), so the recompute scan semi-joins to it — filtered
          // map-side, unchanged groups untouched. A vanished group gets
          // nulls here and is deleted by the n_rows condition anyway.
          val changedGroups = signedDelta.select(groupCols.map(col): _*)
          val recomputed = source.readVersion(to)
            .join(changedGroups, groupCols, "left_semi")
            .groupBy(groupCols.map(col): _*)
            .agg(recomputeAggs.head, recomputeAggs.tail: _*)
          // NOT checkpointed (measured, round 11): the recompute join's
          // downstream consumers already collapse through mergeInto's
          // ≤64-row local-relation fast path at trickle delta sizes, so
          // an eager materialization here only added a blocking job
          // (A/B: +13% on mv_incremental_minmax); the inner signedDelta
          // checkpoint above already keeps the two-snapshot scan single.
          signedDelta.join(recomputed, groupCols, "left")
        }
      } catch {
        // retention lost the from-version manifest (refresh lag exceeded
        // write.versions-retained): the documented fallback is a rebuild.
        // ONLY that precise condition — an unrelated IllegalArgumentException
        // (bad column after a source schema change, say) must propagate,
        // not silently degrade every refresh into an O(source) reseed.
        case _: ManagedTable.RetentionLostException => return reseed()
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
      ("n_rows" -> (coalesce(col("t.n_rows"), lit(0L)) + col("s.n_rows"))) ++
      // recomputed columns REPLACE (absolute values, not deltas)
      recomputeCols.map(c => c -> col(s"s.$c")).toMap
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
  private val MaxKey = "mv.max-cols"
  private val MinKey = "mv.min-cols"
  private val NdKey = "mv.distinct-cols"
  private val SourceKey = "mv.source-table"

  /** Create `<name>` as a materialized `SELECT groupCols, sum(sumCols…),
    * count(*), max(maxCols…), min(minCols…), count(distinct
    * distinctCols…) FROM source GROUP BY groupCols` and seed it from the
    * source's current snapshot.
    */
  def create(spark: SparkSession, warehouse: String, name: String,
             source: ManagedTable, groupCols: Seq[String],
             sumCols: Seq[String],
             maxCols: Seq[String] = Seq.empty,
             minCols: Seq[String] = Seq.empty,
             distinctCols: Seq[String] = Seq.empty): MaterializedView = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(source.meta.identifierFields.nonEmpty,
      "materialized views need a keyed (upsert) source table")
    val schemaProbe = {
      val aggs = (sumCols.map(c => sum(col(c)).as(s"sum_$c")) :+
        count(lit(1)).as("n_rows")) ++
        maxCols.map(c => max(col(c)).as(s"max_$c")) ++
        minCols.map(c => min(col(c)).as(s"min_$c")) ++
        distinctCols.map(c => count_distinct(col(c)).as(s"nd_$c"))
      source.read().groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    val summary = ManagedTable.create(spark, warehouse, name,
      schemaProbe.schema, identifierFields = groupCols,
      properties = Map(
        GroupKey -> groupCols.mkString(","),
        SumKey -> sumCols.mkString(","),
        MaxKey -> maxCols.mkString(","),
        MinKey -> minCols.mkString(","),
        NdKey -> distinctCols.mkString(","),
        SourceKey -> source.name))
    val mv = new MaterializedView(source, summary, groupCols, sumCols,
      maxCols, minCols, distinctCols)
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
      def cols(k: String) =
        p.getOrElse(k, "").split(',').toSeq.filter(_.nonEmpty)
      new MaterializedView(source, summary,
        cols(GroupKey), cols(SumKey), cols(MaxKey), cols(MinKey), cols(NdKey))
    }
}
