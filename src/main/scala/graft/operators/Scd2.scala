package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.{CdcApply, CdcMeta, Operation}

/** Slowly-changing-dimension type-2 derivation over a CDC changelog —
  * the downstream table every warehouse user of the reference ends up
  * hand-rolling: instead of upserting to the latest row per key
  * (SINK/tableoperator/BaseDeltaTaskWriter.java:52-72 semantics), keep
  * EVERY version as a validity interval `[valid_from, valid_to)`.
  *
  * Semantics:
  *  - every non-delete event opens an interval at its sequence value
  *    (`valid_from = seq`);
  *  - the interval closes when the key's NEXT event (any op, including
  *    the delete) arrives: `valid_to = lead(seq)`;
  *  - `is_current` marks the open interval (`valid_to IS NULL`) — a key
  *    whose last event is a delete has no current row;
  *  - delete events close their predecessor but emit no row themselves.
  *
  * Within-key ordering is the same total order the C2 dedup fold uses —
  * (seq, op-priority, arrival) — so a key's SCD2 current row is always
  * exactly the row [[graft.cdc.CdcApply.upsert]] would have kept.
  *
  * Scale shape: ONE hash shuffle of the changelog on the key columns
  * (the window partition); no joins, no driver-side state. At 100 TB the
  * window sort is per-key and spills per partition — the same cost
  * envelope as the dedup it generalizes.
  */
object Scd2 {

  /** Full-history rebuild from a changelog.
    *
    * @param changelog one row per event; must contain `pks`, `seqCol`
    *                  and `opCol`
    * @param pks       identifier fields (the SCD natural key)
    * @param seqCol    monotone per-key sequence (e.g. source ts in
    *                  micros) — becomes `valid_from`/`valid_to`
    * @param arrival   deterministic tie-break within equal `seqCol`
    *                  (e.g. the event id / Kafka offset)
    */
  def history(changelog: DataFrame, pks: Seq[String], seqCol: String,
              arrival: Column, opCol: String = CdcMeta.Op): DataFrame = {
    require(pks.nonEmpty, "SCD2 requires identifier fields")
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(seqCol).asc, expr(Operation.prioritySql(opCol)).asc, arrival.asc)
    changelog
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(!CdcApply.isDelete(opCol))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time reconstruction: the table state a consumer replaying
    * the changelog would have observed at sequence value `asOf` — the
    * last event per key with `seqCol <= asOf` under the same
    * (seq, op-priority, arrival) total order, minus keys whose last
    * event is a delete. Equivalent to filtering [[history]]'s intervals
    * to `valid_from <= asOf < valid_to`, but computed as a `max_by`
    * aggregate rather than a window: Catalyst plans a map-side partial
    * aggregation, so the shuffle carries one candidate per key per input
    * partition instead of every raw event — the
    * [[graft.cdc.Dedup.deduplicate]] scale shape.
    */
  def snapshotAt(changelog: DataFrame, pks: Seq[String], seqCol: String,
                 arrival: Column, asOf: Column,
                 opCol: String = CdcMeta.Op): DataFrame = {
    require(pks.nonEmpty, "snapshot reconstruction requires identifier fields")
    val filtered = changelog.filter(col(seqCol) <= asOf)
    val cols = changelog.columns.toSeq
    val orderKey = struct(
      col(seqCol).as("seq"),
      expr(Operation.prioritySql(opCol)).as("prio"),
      arrival.as("arrival"))
    filtered.groupBy(pks.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*), orderKey).as("__winner"))
      .select(cols.map(c => col(s"__winner.$c").as(c)): _*)
      .filter(!CdcApply.isDelete(opCol))
  }
}
