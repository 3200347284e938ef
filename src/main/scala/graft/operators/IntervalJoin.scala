package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval-overlap join (closed intervals: `l.start <= r.end
  * AND r.start <= l.end`).
  *
  * Spark plans a raw overlap predicate as a broadcast NESTED-LOOP join —
  * O(|L|·|R|) per key and a non-starter at scale. The standard fix,
  * re-expressed declaratively: quantize time into fixed `binWidth` bins,
  * explode each interval over the bins it touches, and EQUI-join on
  * (keys, bin) — Catalyst then plans a plain shuffled hash/sort-merge
  * join whose cost is pairs-that-share-a-bin, not all pairs. A pair
  * overlapping in several bins would duplicate, so only the canonical
  * first-overlap bin (`floor(max(starts)/W)`) emits it — a codegen'd
  * filter, no distinct needed.
  *
  * Choose `binWidth` near the typical interval length: the explode
  * factor is `span/W + 1` per row, the join selectivity is what bins
  * buy. Long-tail intervals inflate the explode side linearly — cap or
  * split outliers upstream. Non-negative bounds only (`div` truncation
  * = floor there); rows with `end < start` are dropped (empty interval).
  *
  * Output: left columns prefixed `l_`, right prefixed `r_`.
  */
object IntervalJoin {

  def binnedOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                    startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    Seq(startCol, endCol).foreach { c =>
      require(left.columns.contains(c) && right.columns.contains(c),
        s"both sides need interval column '$c'")
    }
    def binned(df: DataFrame, p: String, bin: String) = {
      val renamed = df.select(df.columns.toIndexedSeq.map(c => col(c).as(p + c)): _*)
        .filter(col(p + endCol) >= col(p + startCol))
      renamed.withColumn(bin, explode(sequence(
        expr(s"`$p$startCol` div $binWidth"),
        expr(s"`$p$endCol` div $binWidth"))))
    }
    val l = binned(left, "l_", "__lbin")
    val r = binned(right, "r_", "__rbin")
    val cond = (keys.map(k => col(s"l_$k") === col(s"r_$k")) :+
      (col("__lbin") === col("__rbin"))).reduce(_ && _)
    val overlap = col(s"l_$startCol") <= col(s"r_$endCol") &&
      col(s"r_$startCol") <= col(s"l_$endCol")
    val canonical = col("__lbin") ===
      expr(s"greatest(`l_$startCol`, `r_$startCol`) div $binWidth")
    l.join(r, cond).filter(overlap && canonical).drop("__lbin", "__rbin")
  }
}
