package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column data clustering — the
  * layout step behind Iceberg/Delta `rewrite_data_files(strategy =>
  * 'sort', sort_order => 'zorder(...)')`. Rows close in z-value are close
  * in EVERY clustered dimension, so range-partitioning a table by
  * z-value yields file groups whose min/max bounds are narrow on all the
  * clustered columns at once — and the manifest-bounds pruning that
  * previously only paid off for the leading sort key starts paying off
  * for each of them.
  *
  * The computation is two tiny driver-visible aggregates (per-column
  * min/max) plus a pure codegen'd expression: each column is quantized
  * to `bitsPerCol` uniform buckets between its min and max with
  * `width_bucket`, and the bucket bits are interleaved column-major.
  * Uniform (not quantile) bucketing is deliberate: bucket skew affects
  * only layout balance — which the subsequent `repartitionByRange` on
  * the z-value re-balances by sampling anyway — never correctness.
  */
object ZOrder {

  /** Interleaved z-value over `cols` (all must be numeric/date-like;
    * nulls rank lowest). One small agg job computes the per-column
    * ranges; the returned Column is pure expression after that.
    */
  def zValue(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 8): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bitsPerCol > 0 && bitsPerCol * cols.size <= 62,
      s"bit budget out of range: $bitsPerCol bits x ${cols.size} cols")
    val mmAggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"mn_$c"), max(col(c).cast("double")).as(s"mx_$c")))
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    val nb = 1 << bitsPerCol
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val mn = Option(mm.get(mm.fieldIndex(s"mn_$c"))).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val mx = Option(mm.get(mm.fieldIndex(s"mx_$c"))).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val rank =
        if (mx <= mn) lit(0L) // constant or empty column: a single bucket
        else least(greatest(
          width_bucket(col(c).cast("double"), lit(mn), lit(mx), lit(nb)) - 1,
          lit(0L)), lit((nb - 1).toLong))
      (coalesce(rank, lit(0L)), i)
    }
    val n = cols.size
    val bitTerms = for {
      (rank, c) <- ranks
      j <- 0 until bitsPerCol
    } yield shiftleft(shiftright(rank, j).bitwiseAND(lit(1L)), j * n + c)
    bitTerms.reduce(_ + _)
  }
}
