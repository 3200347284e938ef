package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded best-k selection per key — the per-domain / per-source cap of
  * crawl curation ("at most N documents per site"), and the general
  * "champions per group" kernel.
  *
  * The naive plan — one `row_number` window over the key — shuffles every
  * row of a key to ONE task: a hot domain with 10⁹ pages serializes on a
  * single reducer. This operator runs the window twice instead:
  *
  *  1. a pre-cut over `(key, spark_partition_id)` — the input partition id
  *     is a natural, free salt, so the heavy phase spreads a hot key
  *     across however many partitions it arrives on and each task ranks
  *     only its local slice (sort-based window, spills gracefully);
  *  2. the real per-key window over the survivors — at most k rows per
  *     (key, input partition), so its input is k·P per key, not the key's
  *     full row count.
  *
  * Same shuffle bytes as the naive plan in the worst case, but no
  * single-reducer key and a second phase bounded by k — the difference
  * between "finishes uniformly" and "one straggler owns the job" at
  * 100 TB. (The dedup family's salted joins, `operators/Salting.scala`,
  * apply the same idea to joins.)
  *
  * `rankKey` orders ascending — smallest k win. For a deterministic
  * result it must be a TOTAL order (include a unique tiebreaker, e.g.
  * `struct(-score, id)`); ties at the cut would otherwise resolve by
  * partition layout.
  */
object TopKPerKey {

  def topK(df: DataFrame, keyCols: Seq[String], rankKey: Column, k: Int): DataFrame = {
    require(keyCols.nonEmpty, "topK requires at least one key column")
    require(k > 0, s"k must be positive: $k")
    val keys = keyCols.map(col)
    // materialized: nondeterministic expressions can't sit inside a
    // window's partitioning directly, and the value must be the MAP-side
    // partition id (pinned before the exchange the window inserts)
    val staged = df.withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(keys :+ col("__pid"): _*).orderBy(rankKey)
    val global = Window.partitionBy(keys: _*).orderBy(rankKey)
    staged.withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= k)
      .withColumn("__grk", row_number().over(global))
      .filter(col("__grk") <= k)
      .drop("__pid", "__lrk", "__grk")
  }
}
