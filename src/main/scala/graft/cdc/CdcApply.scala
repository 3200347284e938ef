package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C3–C7 — apply a CDC batch to a target table state, as a pure
  * DataFrame → DataFrame transform (the write side lives in
  * [[graft.tables.ManagedTable]]).
  *
  * Semantics re-expressed from the reference's per-row delta writer
  * (SINK/tableoperator/BaseDeltaTaskWriter.java:52-72) and its observable
  * test outcomes (TEST/IcebergChangeConsumerUpsertTest.java,
  * TEST/IcebergChangeConsumerUpsertDeleteDeletesTest.java:63-145):
  *
  *  - upsert with PK: per key, the batch winner (after C2 dedup) replaces
  *    the existing row — equality-delete + insert becomes
  *    anti-join + union here, i.e. the relational form of MERGE INTO.
  *  - keepDeletes=true (C4 soft delete): the winning delete row is
  *    retained (`__op='d'`, `__deleted=true`).
  *  - keepDeletes=false (C5 hard delete): the key vanishes; a delete of a
  *    never-present key or an insert-then-delete within one batch nets to
  *    zero rows.
  *  - no PK (C6): append fallback.
  *
  * Scale notes: the anti-join keys are the *deduped batch* keys. The join
  * strategy is deliberately left to AQE rather than a forced broadcast
  * hint: a trickle micro-batch converts to a broadcast hash join at
  * runtime (batch keys are tiny), while a snapshot-load backfill batch
  * (`op='r'` first run — table-scale keys) keeps a shuffle join instead of
  * OOMing the driver. Partition-level copy-on-write (only rewriting files
  * whose partitions contain touched keys) is handled by the table layer.
  */
object CdcApply {

  /** What to do with a batch row whose identifier field is null (e.g. a
    * corrupt envelope parsed to a null row). The reference throws
    * ("null key", TEST/tableoperator/IcebergTableOperatorTest.java:102-175).
    * Drop discards such rows; DeadLetter additionally quarantines the raw
    * envelopes into a queryable table (pipeline level — see
    * [[graft.streaming.CdcPipeline]]; at this level it guards like Drop).
    */
  sealed trait NullKeyPolicy
  object NullKeyPolicy {
    case object Fail extends NullKeyPolicy
    case object Drop extends NullKeyPolicy
    case object DeadLetter extends NullKeyPolicy
  }

  final case class UpsertConfig(
      keepDeletes: Boolean = true,
      dedupColumn: String = Dedup.DefaultDedupColumn,
      opColumn: String = CdcMeta.Op,
      runDedup: Boolean = true,
      nullKeyPolicy: NullKeyPolicy = NullKeyPolicy.Fail
  )

  /** Enforce the null-identifier contract on a batch (reference: "null key"
    * error, TEST/tableoperator/IcebergTableOperatorTest.java:102-175).
    */
  def guardKeys(batch: DataFrame, pks: Seq[String],
                policy: NullKeyPolicy = NullKeyPolicy.Fail): DataFrame =
    policy match {
      case NullKeyPolicy.Drop | NullKeyPolicy.DeadLetter =>
        batch.na.drop("any", pks)
      case NullKeyPolicy.Fail =>
        // In-line runtime assertion — no extra Spark job, rides the same scan.
        val guarded = batch.columns.map { c =>
          if (pks.contains(c))
            when(col(c).isNull,
              raise_error(lit(s"null identifier field '$c' in upsert batch")))
              .otherwise(col(c)).as(c)
          else col(c)
        }
        batch.select(guarded.toSeq: _*)
    }

  /** The per-key winners of a batch after key-guarding and C2 dedup — the
    * rows an upsert would write. Shared by the state-level [[upsert]] and
    * the table layer's merge-on-read path (which turns exactly these rows
    * into an equality-delete file + a data file, cf. the reference's
    * delete+insert delta writer, BaseDeltaTaskWriter.java:52-72).
    */
  def batchWinners(batch: DataFrame, pks: Seq[String],
                   cfg: UpsertConfig = UpsertConfig()): DataFrame = {
    require(pks.nonEmpty, "upsert requires identifier fields (use append)")
    val checked = guardKeys(batch, pks, cfg.nullKeyPolicy)
    if (cfg.runDedup) Dedup.deduplicate(checked, pks, cfg.dedupColumn, cfg.opColumn)
    else checked
  }

  /** True iff the row is a delete event. NULL-safe: a null/absent op is
    * NOT a delete (the row is kept) — and the MoR tombstone flag in
    * [[graft.tables.ManagedTable]] uses the same predicate, so the
    * relational fold and the table state can never diverge on null ops.
    */
  def isDelete(opColumn: String): org.apache.spark.sql.Column =
    coalesce(col(opColumn) === Operation.Delete, lit(false))

  /** Drop the rows a hard-delete config removes from the winner set. */
  def filterSurvivors(winners: DataFrame, cfg: UpsertConfig): DataFrame =
    if (cfg.keepDeletes) winners
    else winners.filter(!isDelete(cfg.opColumn))

  /** Compute the post-batch state of an upsert table. `target` columns are
    * the table schema; `batch` must be conformable to it.
    */
  def upsert(target: DataFrame, batch: DataFrame, pks: Seq[String],
             cfg: UpsertConfig = UpsertConfig()): DataFrame = {
    val deduped = batchWinners(batch, pks, cfg)
    val survivors = filterSurvivors(deduped, cfg)
    // No broadcast() hint: AQE picks broadcast for trickle batches from
    // runtime stats and falls back to shuffle for table-scale backfills.
    val touchedKeys = deduped.select(pks.map(col): _*).distinct()
    val kept = target.join(touchedKeys, pks, "left_anti")
    kept.unionByName(EventDecoder.conformTo(survivors, kept.schema))
  }

  /** C6 — append fallback (no identifier fields): every event version is a
    * new row (TEST/IcebergChangeConsumerUpsertTest.java:171-210).
    */
  def append(target: DataFrame, batch: DataFrame): DataFrame =
    target.unionByName(EventDecoder.conformTo(batch, target.schema), allowMissingColumns = true)
}
