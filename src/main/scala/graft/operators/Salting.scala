package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the knob to reach for when AQE's runtime
  * skew-join splitting isn't enough (e.g. a single power-law key in a
  * groupBy, where all rows for the key land on one reducer regardless of
  * partition count).
  *
  * Pattern: salt the key into `buckets` sub-keys → partial aggregate per
  * (key, salt) → final aggregate per key. Two shuffles, but the first one
  * spreads the hot key over `buckets` reducers; the second only moves
  * `buckets` pre-aggregated rows per key. Classic two-phase (map-side-
  * combine-style) aggregation made explicit.
  */
object Salting {

  /** Deterministic salt in [0, buckets) — hash of the whole row's
    * monotonic id would break determinism across retries, so salt from a
    * stable column set instead.
    */
  def salt(buckets: Int, stableCols: Column*): Column =
    pmod(xxhash64(stableCols: _*), lit(buckets))

  /** Salted two-phase count per key. */
  def saltedCount(df: DataFrame, keys: Seq[String], saltFrom: Seq[String],
                  buckets: Int = 32, as: String = "n"): DataFrame =
    df.withColumn("__salt", salt(buckets, saltFrom.map(col): _*))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__pc"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__pc").as(as))

  /** Salted two-phase sum of `valueCol` per key (any associative
    * aggregate decomposes the same way: partial per (key, salt), merge per
    * key).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltFrom: Seq[String], buckets: Int = 32, as: String = "sum"): DataFrame =
    df.withColumn("__salt", salt(buckets, saltFrom.map(col): _*))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__ps"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__ps").as(as))

  /** Broadcast-salted join for a skewed LEFT side against a small-ish
    * right side: left rows keep one salt each; the right side is exploded
    * `buckets`× so every (key, salt) bucket finds its match. Turns one hot
    * reducer into `buckets` balanced ones at the cost of replicating the
    * right side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    // any salt value works for the left side (the right covers all of
    // them); seeded rand is partition-deterministic, the standard choice
    val saltedLeft = left.withColumn("__salt",
      (rand(42) * buckets).cast("int"))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}
