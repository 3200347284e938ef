package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: the "does the replica match the source?" audit
  * every operator of a CDC pipeline (the reference included) ends up
  * hand-rolling after an incident. Compares two relations by primary key
  * and reports ONLY the differences:
  *
  *  - `missing_in_target` — key present in source, absent in target;
  *  - `extra_in_target`   — key present in target, absent in source;
  *  - `mismatch`          — key in both, compared columns differ.
  *
  * Equal rows (the overwhelmingly dominant case on a healthy 100 TB
  * replica) are dropped before the result materializes, so the output is
  * diff-sized, not table-sized.
  *
  * Scale shape: one hash shuffle of each side on the key columns for the
  * full-outer join (AQE broadcasts if either side is small — e.g.
  * reconciling one partition against its source slice); the non-key
  * columns are packed into a single struct per side, and struct
  * null-safe equality (`<=>`) evaluates inside codegen — no UDF, no
  * per-column join conditions to defeat pushdown. Works identically when
  * either side is a [[graft.tables.ManagedTable.read]] MoR scan.
  */
object Reconcile {

  /** Diff `target` against `source` on `pks`, comparing `compareCols`
    * (default: every shared non-key column, in source column order).
    * Returns the key columns plus a `status` column; equal rows absent.
    *
    * Keys need not be unique and may contain nulls — each side is first
    * collapsed to one row per key carrying the sorted MULTISET of its
    * packed payloads (a healthy replica has exactly one, so the list is
    * almost always a singleton), and the join is null-safe on every key
    * column. Duplicate-cardinality drift and payload drift both surface
    * as `mismatch`; an all-null key on both sides reconciles as one key
    * rather than double-reporting as missing+extra. The pre-aggregation
    * hash-partitions each side on `pks`, the exact distribution the join
    * needs, so Catalyst reuses the exchange — still one shuffle per side.
    */
  def diff(source: DataFrame, target: DataFrame, pks: Seq[String],
           compareCols: Seq[String] = Seq.empty): DataFrame = {
    require(pks.nonEmpty, "reconciliation requires key columns")
    val shared = source.columns.filter(target.columns.toSet)
    val cmp = if (compareCols.nonEmpty) compareCols
              else shared.toSeq.filterNot(pks.contains)
    val missing = (pks ++ cmp).filterNot(shared.toSet)
    require(missing.isEmpty,
      s"columns not present on both sides: ${missing.mkString(",")}")
    // key-only relations still reconcile on presence (and cardinality):
    // a constant non-null payload makes the outer-join null checks below
    // well-defined
    def pack = if (cmp.isEmpty) lit(true) else struct(cmp.map(col): _*)
    def packed(side: DataFrame, as: String) = side
      .groupBy(pks.map(col): _*)
      .agg(sort_array(collect_list(pack)).as(as))
    // explicit aliases: reconciling a relation against itself (the
    // degenerate healthy-replica case) is a self-join, and unqualified
    // key references would be ambiguous
    val s = packed(source, "__src").alias("__recon_s")
    val t = packed(target, "__tgt").alias("__recon_t")
    def sk(k: String) = col(s"__recon_s.$k")
    def tk(k: String) = col(s"__recon_t.$k")
    val keyEq = pks.map(k => sk(k) <=> tk(k)).reduce(_ && _)
    s.join(t, keyEq, "full_outer")
      .withColumn("status",
        when(col("__tgt").isNull, lit("missing_in_target"))
          .when(col("__src").isNull, lit("extra_in_target"))
          .when(!(col("__src") <=> col("__tgt")), lit("mismatch")))
      .where(col("status").isNotNull)
      .select(pks.map(k => coalesce(sk(k), tk(k)).as(k)) :+ col("status"): _*)
  }

  /** Anti-entropy repair: make a [[graft.tables.ManagedTable]] replica
    * converge to `source` by applying ONE merge built from the diff —
    * source rows for missing/mismatched keys upsert, extra keys
    * tombstone. Cost is diff-sized on the write side (the healthy 100 TB
    * replica's repair writes nothing but the diff), plus the one diff
    * pass; [[diff]] run again afterwards is empty — the spec's contract.
    *
    * `source` must be unique and non-null per key (the CDC upsert
    * contract — repair goes through the same merge machinery). The diff
    * keys are pinned with a localCheckpoint before the merge so the fix
    * is computed against the PRE-repair state, not re-planned mid-write.
    * Returns (upserted, deleted) key counts.
    */
  def repair(table: graft.tables.ManagedTable, source: DataFrame): (Long, Long) = {
    val pks = table.meta.identifierFields
    require(pks.nonEmpty, "repair requires a keyed table")
    val d = diff(source, table.read(), pks).localCheckpoint(true)
    val upsertKeys = d.filter(col("status") =!= "extra_in_target")
      .select(pks.map(col): _*)
    val extraKeys = d.filter(col("status") === "extra_in_target")
      .select(pks.map(col): _*)
    val nUp = upsertKeys.count()
    val nDel = extraKeys.count()
    if (nUp + nDel == 0) return (0L, 0L)
    val upserts = source.join(upsertKeys, pks, "left_semi")
      .withColumn("__repair_del", lit(false))
    // delete markers carry only the key; payload columns ride as nulls
    // (the D branch never reads them)
    val delRows = extraKeys
      .select(source.columns.toIndexedSeq.map(c =>
        if (pks.contains(c)) col(c) else lit(null).cast(source.schema(c).dataType).as(c)): _*)
      .withColumn("__repair_del", lit(true))
    table.mergeInto(upserts.unionByName(delRows),
      deleteWhen = Some(col("s.__repair_del")),
      insertWhen = Some(!col("s.__repair_del")))
    (nUp, nDel)
  }
}
