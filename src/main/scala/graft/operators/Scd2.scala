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
}
