package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the
  * latest right row with `right.ts <= left.ts` within the same key group
  * (the temporal-join primitive CDC consumers and feature pipelines need;
  * the reference's closest analog is its last-per-key batch dedup —
  * SINK/tableoperator/IcebergTableOperator.java:58-92 — which is the
  * degenerate self-as-of case).
  *
  * Spark has no ASOF JOIN operator, and the naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-per-left) explodes to
  * O(|L|·|R| / keys) intermediate rows. This implementation is the
  * union-sort-carry pattern instead: tag both sides, union them, and
  * carry the most recent right payload forward with a running
  * `last(_, ignoreNulls = true)` window. Cost is ONE hash shuffle of
  * |L|+|R| rows on the key plus a per-key sort — the same plan shape a
  * 1000-executor cluster wants at 100 TB (no broadcast requirement, no
  * row explosion, AQE-skew-splittable).
  *
  * Tie policy: at equal timestamps the right row is visible to the left
  * row (matches DuckDB/pandas `ASOF JOIN ... ON l.ts >= r.ts`). Right rows
  * must be unique per (keys, ts) for deterministic output — pre-dedup with
  * [[graft.cdc.Dedup]] if not.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach, emitted as `prefix+name`
    * @param tolerance max allowed `left.ts - right.ts`; matches older than
    *        this are nulled out. Unit: MICROSECONDS for timestamp ts
    *        columns (`unix_micros`, full precision — a bare `cast("long")`
    *        would floor to epoch seconds), the column's own unit for
    *        numeric ts columns
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[Long] = None
  ): DataFrame = {
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    // Right payload travels inside one struct: it is non-null exactly on
    // right rows, so `last(ignoreNulls)` finds the latest right ROW even
    // when individual payload fields are legitimately null.
    val rPay = struct(col(rightTs).as("__rts") +: payload.map(col): _*)

    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ats"), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(right.select(rPay).schema.head.dataType).as("__rpay"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ats"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rPay.as("__rpay"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val inRange = tolerance match {
      case Some(t) =>
        import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
        // timestamp cast("long") floors to epoch SECONDS — use micros
        def asLong(c: org.apache.spark.sql.Column) =
          left.schema(leftTs).dataType match {
            case TimestampType    => unix_micros(c)
            case TimestampNTZType => unix_micros(c.cast(TimestampType))
            case _                => c.cast("long")
          }
        when(asLong(col("__ats")) - asLong(col("__match.__rts")) <= t, col("__match"))
      case None => col("__match")
    }
    carried
      .withColumn("__match", inRange)
      .select(keys.map(col) ++ leftCols.map(col) ++
        (col("__match.__rts").as(s"${prefix}ts") +:
          payload.map(p => col(s"__match.$p").as(s"$prefix$p"))): _*)
  }
}
