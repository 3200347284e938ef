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
  def markerKey(src: ManagedTable): String =
    s"replication.applied-upto.${keySuffix(src)}"

  /** Sync-boundary version map: `srcVersion:dstVersion` pairs recording
    * which REPLICA snapshot holds the upstream's state at each synced
    * upstream version. Replica version numbers are not upstream version
    * numbers (many upstream commits collapse into one apply commit), so
    * this map is what lets a tag created upstream AFTER the fact — at a
    * version the replica already passed — still pin the right replica
    * snapshot. Bounded: the most recent [[MapCap]] boundaries (older
    * replica snapshots age out of `write.versions-retained` anyway, at
    * which point [[ManagedTable.tag]] would refuse the pin upstream too).
    */
  def mapKey(src: ManagedTable): String =
    s"replication.version-map.${keySuffix(src)}"

  /** Names of replica tags OWNED by the mirror (created by [[mirrorRefs]])
    * — only these follow upstream drops; a replica-local tag, even one
    * sharing a name with an upstream tag, is never touched.
    */
  def mirroredKey(src: ManagedTable): String =
    s"replication.mirrored-tags.${keySuffix(src)}"

  /** Upstream tags the mirror could NOT reproduce (their version predates
    * the seed, fell between sync boundaries before the tag existed, or
    * the replica snapshot aged out of retention) — surfaced as a property
    * so the skip is visible instead of silent.
    */
  def unmirroredKey(src: ManagedTable): String =
    s"replication.unmirrored-tags.${keySuffix(src)}"

  private val MapCap = 256

  private def keySuffix(src: ManagedTable): String = {
    val loc = s"${src.warehouse}/${src.name}"
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(loc.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${src.name}.$d"
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
    val r = applied match {
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
    // tags are metadata-only upstream (no version bump), so the mirror
    // pass runs on EVERY sync — including caught-up polls, where it is a
    // pure property diff (zero Spark jobs, zero writes when nothing
    // changed). WAP branches are deliberately NOT replicated: a branch is
    // single-writer staging state mid-audit, not published history.
    mirrorRefs(src, dst, key)
    r
  }

  /** The not-yet-caught-up tail of [[syncOnce]]: seed or incremental
    * apply up to the pinned `to`. An incremental catch-up SPLITS at every
    * upstream version a live tag pins inside the range — each tagged
    * state must land as its own replica snapshot for the mirrored tag to
    * have something byte-stable to point at; untagged intermediate
    * versions still collapse into one apply (the O(changes) shape is
    * unchanged, tags just add commit boundaries).
    */
  private def syncBelow(src: ManagedTable, dst: ManagedTable,
                        ids: Seq[String], key: String, to: Long,
                        applied: Option[Long]): Long =
    applied match {
      case None =>
        if (to == 0L) { dst.setProperties(Map(key -> "0")); 0L }
        else { dst.overwrite(snapshotAt(src, to), Map(key -> to.toString)); to }
      case Some(from) =>
        // record the CURRENT boundary (from → the replica version that
        // holds it) before the first apply commits a newer one: a crash
        // between a previous sync's apply and its mirror pass would
        // otherwise lose that pair forever — the next apply moves the
        // handle past it and the tag that needed it stays unmirrorable
        mirrorRefs(src, dst, key)
        val barrier = src.meta.properties
          .get(ManagedTable.BarrierKey).map(_.toLong).getOrElse(Long.MinValue)
        if (barrier > from) {
          // a non-incremental rewrite upstream: rows vanished without
          // tombstones, so the range (from, to] cannot reconstruct the
          // state — reseed from the pinned snapshot. Tagged versions
          // behind the barrier with no recorded boundary are unmirrorable
          // (their replica states were never built) — [[mirrorRefs]]
          // surfaces them.
          dst.overwrite(snapshotAt(src, to), Map(key -> to.toString))
        } else {
          val cuts = src.tags().values
            .filter(v => v > from && v < to).toSeq.distinct.sorted :+ to
          cuts.foldLeft(from) { (prev, b) =>
            applyRange(src, dst, ids, key, prev, b)
            // record the boundary (and mirror its tag) as soon as the
            // state exists, so a crash later in the loop loses nothing
            if (b != to) mirrorRefs(src, dst, key)
            b
          }
        }
        to
    }

  /** Apply one changelog sub-range (from, b] as a single replica commit
    * with the marker riding it.
    */
  private def applyRange(src: ManagedTable, dst: ManagedTable,
                         ids: Seq[String], key: String,
                         from: Long, b: Long): Unit =
    if (src.hasChangesBetween(from, b)) {
      val cols = src.meta.schema.fieldNames.toSeq
      val changes = src.readChangesBetween(from, b)
      if (ids.nonEmpty) {
        // the changelog is already NET per key with a tombstone
        // verdict per row — exactly applyNetChanges' input shape
        dst.applyNetChanges(
          changes.select((cols :+ ManagedTable.TombstoneCol).map(col): _*),
          ManagedTable.TombstoneCol, Map(key -> b.toString))
      } else {
        // keyless: the range is pure appended rows (no upsert groups
        // exist to fold or tombstone) — re-append them
        dst.append(changes.select(cols.map(col): _*), Map(key -> b.toString))
      }
      // an in-range commit can still net to ZERO rows (an empty
      // upstream micro-batch commits a 0-row group): the apply skips
      // and rolls its properties back — advance the marker anyway or
      // every later poll re-reads this range forever
      if (!dst.meta.properties.get(key).contains(b.toString))
        dst.setProperties(Map(key -> b.toString))
    } else {
      // versions advanced with nothing in range (metadata commits):
      // advance the marker without burning a replica version
      dst.setProperties(Map(key -> b.toString))
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
    *
    * Tags mirror through the same per-batch syncOnce. One cadence note:
    * a PURE tag commit upstream rewrites meta.json in place and writes
    * no manifest, so it alone does not wake the follower — the tag
    * mirrors at the next wake (any upstream commit, or a restart). Every
    * tag present by the time its snapshot's range syncs is exact (the
    * apply splits at tagged versions), so the lag affects visibility
    * latency only, never which snapshot the tag pins.
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

  /** Mirror upstream TAGS onto the replica (round 10) — so `VERSION AS OF
    * '<tag>'` keeps working after a failover. Runs on every [[syncOnce]]:
    *
    *  1. Records the sync boundary (upstream marker version → the replica
    *     version OUR apply landed) into the version map. Read from the
    *     in-memory handle, not a re-load, so a foreign commit racing the
    *     replica cannot skew the pair.
    *  2. Drops replica tags the mirror created whose upstream tag is gone
    *     — expiry flows through, releasing the replica snapshot's GC pin.
    *  3. Creates / re-points a replica tag for every upstream tag whose
    *     version has a mapped replica snapshot. Only names the mirror
    *     OWNS are written: a replica-local tag sharing an upstream name
    *     is never clobbered.
    *
    * Tags the replica cannot reproduce — version behind the seed/barrier,
    * between boundaries before the tag existed, snapshot aged out of
    * replica retention, or a name conflict — are listed under
    * [[unmirroredKey]] instead of failing the sync (they would fail it
    * forever). All bookkeeping is property-diffed first: a caught-up poll
    * with no tag changes writes NOTHING.
    *
    * Idempotent and crash-safe without riding the apply commit: a replay
    * re-derives the same tags from the same map, and a crash between
    * apply and mirror is healed by the next sync, which records the
    * still-current boundary pair BEFORE its first apply moves the handle
    * past it ([[syncBelow]]'s leading mirror pass).
    */
  private def mirrorRefs(src: ManagedTable, dst: ManagedTable,
                         key: String): Unit = {
    val before = dst.meta.properties
    val map0 = decodeMap(before.get(mapKey(src)))
    val map = before.get(key).map(_.toLong) match {
      case Some(m) if !map0.contains(m) => map0 + (m -> dst.meta.currentVersion)
      case _ => map0
    }
    val srcTags = src.tags()
    val mirrored = decodeList(before.get(mirroredKey(src)))
    // drops first: a mirrored tag that vanished upstream expires here too
    val dropped = mirrored.filterNot(srcTags.contains)
    dropped.filter(dst.tags().contains).foreach(dst.dropTag)
    val dstTags = dst.tags()
    val unmirrored = List.newBuilder[String]
    val live = srcTags.toSeq.sortBy(_._1).flatMap { case (n, sv) =>
      val owned = mirrored.contains(n) || !dstTags.contains(n)
      map.get(sv) match {
        case Some(dv) if owned && !n.contains(',') =>
          if (dstTags.get(n).contains(dv)) Some(n)
          else
            try { dst.tag(n, dv); Some(n) }
            catch { // snapshot aged out of replica retention
              case _: IllegalArgumentException => unmirrored += n; None
            }
        case _ => unmirrored += n; None // local-name conflict or no boundary
      }
    }
    // one bookkeeping write, only when something changed
    val now = dst.meta.properties
    val want = Map(
      mapKey(src) -> encodeMap(map),
      mirroredKey(src) -> live.distinct.sorted.mkString(","),
      unmirroredKey(src) -> unmirrored.result().distinct.sorted.mkString(","))
      .filter(_._2.nonEmpty)
    val stale = Seq(mapKey(src), mirroredKey(src), unmirroredKey(src))
      .filter(k => now.contains(k) && !want.contains(k))
    if (want.exists { case (k, v) => !now.get(k).contains(v) })
      dst.setProperties(want)
    if (stale.nonEmpty) dst.unsetProperties(stale)
  }

  private def decodeMap(s: Option[String]): Map[Long, Long] =
    s.filter(_.nonEmpty).map(_.split(',').map { p =>
      val Array(a, b) = p.split(':'); a.toLong -> b.toLong
    }.toMap).getOrElse(Map.empty)

  private def encodeMap(m: Map[Long, Long]): String =
    m.toSeq.sortBy(_._1).takeRight(MapCap)
      .map { case (a, b) => s"$a:$b" }.mkString(",")

  private def decodeList(s: Option[String]): Seq[String] =
    s.filter(_.nonEmpty).map(_.split(',').toSeq).getOrElse(Seq.empty)

  /** The upstream's LOGICAL columns (its declared schema) — the changelog
    * additionally carries seq/tombstone meta, and a CDC-built upstream
    * may carry its own op/ts meta columns, which replicate as plain data.
    */
  private def logicalSchema(src: ManagedTable) = src.meta.schema

  private def snapshotAt(src: ManagedTable, v: Long) =
    src.readVersion(v).select(src.meta.schema.fieldNames.map(col).toIndexedSeq: _*)
}
