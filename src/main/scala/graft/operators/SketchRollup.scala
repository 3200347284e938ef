package graft.operators

import graft.tables.ManagedTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-aggregated distinct-count serving via mergeable HLL sketches
  * (Spark's built-in Datasketches functions): build per-bucket sketches
  * ONCE — e.g. distinct users per (day, country) — persist them as a
  * BINARY column, and answer "distinct over ANY bucket combination"
  * by unioning stored sketches instead of rescanning raw events. The
  * classic serving-layer pattern at 100 TB: the raw-event scan happens
  * once per ingest slice; every ad-hoc range/rollup question afterwards
  * is metadata-sized (one sketch per bucket, ~2^lgK bytes).
  *
  * Sketch contents are hash-based, but HLL_4 unions are NOT bit-stable
  * under merge order (internal representation transitions differ), so
  * estimates wiggle with partitioning — only within the sketch's error
  * envelope (spec-pinned ≤2 %; the oracle row hashes a 5 % bound, never
  * the raw estimate). Maintenance is union-monotone: APPEND batches fold in with
  * `hll_union` at O(batch) through [[ManagedTable.mergeInto]]; sketches
  * cannot retract, so correcting removed events means rebuilding the
  * affected buckets ([[build]] over the bucket's slice + merge).
  */
object SketchRollup {

  /** Per-key sketches: one row per distinct `keyCols` tuple with the HLL
    * sketch of `valueCol`, the exact row count, and the bucket's exact
    * distinct count (cheap at build time — the data is already grouped —
    * and it lets consumers audit the estimate's error without raw data).
    */
  def build(df: DataFrame, keyCols: Seq[String], valueCol: String,
            lgConfigK: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "no bucket keys")
    df.groupBy(keyCols.map(col): _*).agg(
      hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"),
      count(lit(1)).as("n_rows"),
      count_distinct(col(valueCol)).as("exact_nd"))
  }

  /** Union the sketches of the buckets matching `pred` into one distinct
    * estimate — the serving query: O(matching buckets), never the raw
    * events.
    */
  def estimateWhere(sketches: DataFrame, pred: Column): Long =
    sketches.filter(pred)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("nd"))
      .head().getLong(0)

  /** Fold an append slice's sketches into a persisted rollup table
    * (keyed on `keyCols`): matched buckets union sketch + add counts,
    * new buckets insert — one O(batch-buckets) MoR merge. The exact_nd
    * audit column cannot be maintained under union (distinct counts
    * don't add), so it goes null for merged buckets — the estimate is
    * the maintained answer.
    */
  def mergeInto(table: ManagedTable, slice: DataFrame): Unit =
    table.mergeInto(slice,
      updateSet = Map(
        "sketch" -> expr("hll_union(t.sketch, s.sketch)"),
        "n_rows" -> (col("t.n_rows") + col("s.n_rows")),
        "exact_nd" -> lit(null).cast("long")))
}
