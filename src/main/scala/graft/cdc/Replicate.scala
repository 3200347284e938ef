package graft.cdc

import graft.tables.ManagedTable
import org.apache.spark.sql.functions._

/** Commit-exact graft→graft replication: keep a replica table in sync
  * with an upstream managed table by replaying its changelog — the
  * downstream half of the CDC loop [[ChangeFeed]] opens (the reference's
  * deployment topology, where one table's sink is another pipeline's
  * source), with none of the JSON envelope cost: changes flow as columnar
  * reads of exactly the file groups each upstream commit wrote.
  *
  * One [[syncOnce]] call catches the replica up to the upstream's current
  * version; run it per micro-batch, per poll, or from a cron. The sync is
  * EXACTLY-ONCE under any crash/replay interleaving because the progress
  * marker (`replication.applied-upto.<src>`) rides the SAME commit that
  * applied the changes — there is no window where data landed but the
  * marker didn't, or vice versa. A replayed sync sees the marker already
  * at the target version and does nothing.
  *
  * Cost shape at 100 TB: the idle poll is one manifest read and ZERO
  * Spark jobs ([[ManagedTable.hasChangesBetween]]); a catch-up reads only
  * the file groups of the missed commits (O(changes), the base is never
  * scanned) and applies them as ONE merge-on-read commit (O(changes)
  * write). Only a changelog BARRIER upstream (overwrite / truncate /
  * full compact / partition-region delete) forces a full reseed — the
  * same rule every incremental consumer of the changelog obeys.
  *
  * Schema evolution follows automatically: the replica union-by-name
  * evolves to the upstream schema before each apply, so columns added
  * upstream appear downstream with nulls for pre-evolution rows — the
  * pipeline's D6 semantics end to end.
  */
object Replicate {

  /** The replica-side progress marker: the highest upstream version whose
    * changes this replica has applied, stamped atomically with the apply.
    * Keyed by the upstream's NAME plus a digest of its warehouse location
    * — two same-named tables in different warehouses must never share a
    * marker (versions from one would silently apply as the other's
    * progress).
    */
  def markerKey(src: ManagedTable): String = {
    val loc = s"${src.warehouse}/${src.name}"
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(loc.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"replication.applied-upto.${src.name}.$d"
  }

  /** Catch the replica up to the upstream's current version; returns that
    * version. Safe to call at any cadence, including concurrently with
    * upstream writes (it pins the version it syncs to) and repeatedly
    * after crashes (the marker makes replays no-ops).
    *
    * First call on an EMPTY replica seeds it with a full snapshot; a
    * non-empty replica without a marker is refused (it isn't a replica of
    * anything — clobbering it silently would destroy data).
    *
    * KEYED upstreams apply net per-key changes (upserts + tombstones).
    * KEYLESS upstreams (the log/event shape) re-APPEND each range: sound
    * and exactly-once because keyless tables have no upsert groups —
    * [[ManagedTable.compactMinor]] folds only those, so nothing ever
    * re-seqs a delivered keyless row — and every other keyless mutation
    * (overwrite / truncate / compact / metadata delete) stamps the
    * changelog barrier, which routes to the reseed below.
    */
  def syncOnce(src: ManagedTable, dst: ManagedTable): Long = {
    val ids = src.meta.identifierFields
    require(dst.meta.identifierFields == ids,
      s"replica identifier fields ${dst.meta.identifierFields} != upstream $ids")
    val key = markerKey(src)
    val to = src.meta.currentVersion
    val applied = dst.meta.properties.get(key).map(_.toLong)
    applied match {
      // caught up — or the src HANDLE is stale relative to what some
      // other follower pass already applied; both are zero-job no-ops
      case Some(a) if a >= to => a
      case _ =>
        // the refusal guard runs BEFORE any mutation (including schema
        // evolution): refusing to clobber a table must leave it untouched
        require(applied.isDefined || dst.meta.currentVersion == 0L,
          s"replica ${dst.meta.name} has commits but no replication marker " +
            s"'$key' — refusing to clobber a non-replica table")
        // evolve next, so both the seed and the incremental apply conform
        // the incoming rows to a schema that already holds every upstream
        // column
        dst.evolve(logicalSchema(src))
        syncBelow(src, dst, ids, key, to, applied)
    }
  }

  /** The not-yet-caught-up tail of [[syncOnce]]: seed or incremental
    * apply up to the pinned `to`.
    */
  private def syncBelow(src: ManagedTable, dst: ManagedTable,
                        ids: Seq[String], key: String, to: Long,
                        applied: Option[Long]): Long =
    applied match {
      case None =>
        if (to == 0L) { dst.setProperties(Map(key -> "0")); 0L }
        else { dst.overwrite(snapshotAt(src, to), Map(key -> to.toString)); to }
      case Some(from) =>
        val barrier = src.meta.properties
          .get(ManagedTable.BarrierKey).map(_.toLong).getOrElse(Long.MinValue)
        if (barrier > from) {
          // a non-incremental rewrite upstream: rows vanished without
          // tombstones, so the range (from, to] cannot reconstruct the
          // state — reseed from the pinned snapshot
          dst.overwrite(snapshotAt(src, to), Map(key -> to.toString))
        } else if (src.hasChangesBetween(from, to)) {
          val cols = src.meta.schema.fieldNames.toSeq
          val changes = src.readChangesBetween(from, to)
          if (ids.nonEmpty) {
            // the changelog is already NET per key with a tombstone
            // verdict per row — exactly applyNetChanges' input shape
            dst.applyNetChanges(
              changes.select((cols :+ ManagedTable.TombstoneCol).map(col): _*),
              ManagedTable.TombstoneCol, Map(key -> to.toString))
          } else {
            // keyless: the range is pure appended rows (no upsert groups
            // exist to fold or tombstone) — re-append them
            dst.append(changes.select(cols.map(col): _*), Map(key -> to.toString))
          }
          // an in-range commit can still net to ZERO rows (an empty
          // upstream micro-batch commits a 0-row group): the apply skips
          // and rolls its properties back — advance the marker anyway or
          // every later poll re-reads this range forever
          if (!dst.meta.properties.get(key).contains(to.toString))
            dst.setProperties(Map(key -> to.toString))
        } else {
          // versions advanced with nothing in range (metadata commits):
          // advance the marker without burning a replica version
          dst.setProperties(Map(key -> to.toString))
        }
        to
    }

  /** Continuous replication (round 8): follow the upstream's COMMIT
    * stream ([[ManagedTable.commitStream]] — one row per new manifest,
    * so metadata-only commits like a keyed region delete or truncate
    * wake the follower too, which a data-file stream would sleep
    * through) and run [[syncOnce]] once per micro-batch — the
    * [[graft.tables.MaterializedView.follow]] pattern applied to a
    * replica. The streamed rows are only the WAKE-UP signal: syncOnce
    * re-loads both tables and reads exact committed versions itself, so
    * the file stream's at-least-once delivery cannot affect correctness
    * — a spurious wake-up finds the marker current and costs one
    * manifest read, ZERO Spark jobs (the idle-poll fast path), and
    * exactly-once still comes from the marker riding the apply commit.
    * Restart-safe twice over: the stream resumes from `checkpointDir`,
    * and even a lost checkpoint only causes re-wake-ups the marker
    * no-ops. Barriers upstream (overwrite / truncate / compact / region
    * delete) reseed inside syncOnce, exactly as in the one-shot form.
    */
  def follow(src: ManagedTable, dst: ManagedTable, checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // fail fast on a non-replica destination BEFORE starting the stream
    // (same guard syncOnce applies per batch)
    require(dst.meta.properties.contains(markerKey(src)) ||
        dst.meta.currentVersion == 0L,
      s"replica ${dst.meta.name} has commits but no replication marker — " +
        "refusing to follow onto a non-replica table")
    val (srcWh, srcName) = (src.warehouse, src.name)
    val (dstWh, dstName) = (dst.warehouse, dst.name)
    src.commitStream()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // fresh handles per batch: the long-lived stream must see the
        // upstream's CURRENT version, not the start-time snapshot
        val s = batch.sparkSession
        syncOnce(ManagedTable.load(s, srcWh, srcName).get,
          ManagedTable.load(s, dstWh, dstName).get)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** The upstream's LOGICAL columns (its declared schema) — the changelog
    * additionally carries seq/tombstone meta, and a CDC-built upstream
    * may carry its own op/ts meta columns, which replicate as plain data.
    */
  private def logicalSchema(src: ManagedTable) = src.meta.schema

  private def snapshotAt(src: ManagedTable, v: Long) =
    src.readVersion(v).select(src.meta.schema.fieldNames.map(col).toIndexedSeq: _*)
}
