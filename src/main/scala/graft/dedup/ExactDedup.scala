package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by normalized-content hash.
  *
  * Scale shape: a single hash-groupBy — partial aggregation map-side, one
  * shuffle keyed by the 128-bit digest (uniform, skew-free by
  * construction). At 100 TB this is the cheapest possible dedup: no joins,
  * no windows, shuffle rows are (hash, id) pairs, not documents.
  */
object ExactDedup {

  /** Per-group summary: content hash, group size, canonical (min) id. */
  def groups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("group_size"), min(idCol).as("canonical_id"))

  /** Keep exactly one row (min id) per distinct normalized content. A
    * LEFT SEMI join, as the plan wants: emits each kept row at most once
    * even if ids repeat upstream, and never materializes keep's columns.
    */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = groups(df, textCol, idCol).select(col("canonical_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }
}
