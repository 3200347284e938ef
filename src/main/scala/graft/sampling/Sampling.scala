package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * A 100 TB corpus is sampled and split by *content-stable hashing*, never
  * by `rand()`: the decision for a row must survive re-runs, executor
  * retries, repartitioning, and engine changes, or downstream training
  * sets silently drift (and a train/test split leaks). Every operator here
  * derives its keep/assign decision from `md5(seed || key)` — reproducible
  * bit-for-bit in any engine with md5 (the DuckDB oracle replays it
  * verbatim), independent of row order and partitioning.
  *
  * Scale shape: [[hashSample]] and [[assignSplit]] are map-only (filter /
  * projection over the scan — no shuffle, no state, trivially parallel at
  * any width). [[stratifiedFixed]] is one hash-partition shuffle of the
  * strata key (the deterministic analogue of per-stratum reservoir
  * sampling); its per-stratum top-k never materializes a stratum on one
  * executor beyond the window sort, and skewed strata spill like any sort.
  *
  * The per-key decision space is the first 8 hex chars of md5 (32 bits)
  * reduced mod 10_000 — basis-point granularity (0.01%).
  */
object Sampling {

  /** Deterministic bucket in [0, 10000) from the string form of a key,
    * optionally salted: different seeds give independent samples.
    */
  def bucket(key: Column, seed: String = ""): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000

  /** Bernoulli-style deterministic sample: keep rows whose key hashes into
    * the first `fractionBp` basis points (1 bp = 0.01%). Map-only.
    */
  def hashSample(df: DataFrame, keyCol: String, fractionBp: Int,
                 seed: String = ""): DataFrame = {
    require(fractionBp >= 0 && fractionBp <= 10000, s"fractionBp out of range: $fractionBp")
    df.filter(bucket(col(keyCol), seed) < fractionBp)
  }

  /** Deterministic train/validation/test assignment. `cuts` are cumulative
    * bucket thresholds in basis points, e.g. `Seq(("test", 1000),
    * ("validation", 2000))` → buckets [0,1000) test, [1000,2000)
    * validation, rest train. Same key ⇒ same split, forever — the property
    * that prevents train/test leakage across pipeline re-runs.
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  cuts: Seq[(String, Int)], trainLabel: String = "train",
                  seed: String = ""): DataFrame = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be ascending")
    val b = bucket(col(keyCol), seed)
    val expr = cuts.foldRight(lit(trainLabel): Column) {
      case ((label, cut), rest) => when(b < cut, label).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Fixed-size per-stratum sample: the k rows of each stratum whose keys
    * hash lowest (ties broken by the key itself). One shuffle on the
    * strata columns; deterministic against any input order — the scalable
    * stand-in for per-group reservoir sampling.
    */
  def stratifiedFixed(df: DataFrame, strataCols: Seq[String], keyCol: String,
                      k: Int, seed: String = ""): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedFixed needs at least one stratum column")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(bucket(col(keyCol), seed).asc, col(keyCol).asc)
    df.withColumn("__sample_rank", row_number().over(w))
      .filter(col("__sample_rank") <= k)
      .drop("__sample_rank")
  }
}
