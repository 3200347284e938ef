package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar conversion helpers that have no single built-in equivalent.
  * Everything else in the conversion layer (casts, epoch → timestamp,
  * to_date, unbase64, parse_json) is a native Catalyst expression built in
  * [[graft.cdc.SchemaMapping]].
  */
object Conversions {

  /** Debezium precise-mode decimal: base64 string of the unscaled
    * big-endian two's-complement bytes, plus a fixed scale
    * (reference: SINK/converter/JsonEventConverter.java:256-292,
    * SINK/converter/AbstractEventConverter.java:86-104).
    *
    * Backed by the native [[DecimalFromBytes]] Catalyst expression
    * (doGenCode → stays inside whole-stage codegen; also exposed to SQL as
    * `decimal_from_bytes` via [[graft.GraftExtensions]]).
    */
  def decimalFromBase64(c: Column, precision: Int, scale: Int): Column =
    decimalFromBytes(unbase64(c), precision, scale)

  /** Same, over a binary column directly. */
  def decimalFromBytes(c: Column, precision: Int, scale: Int): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(DecimalFromBytes(GraftBridge.expression(c), precision, scale))
  }

  /** Epoch nanos → micros with exact integer FLOOR division. `c / 1000`
    * is DOUBLE division in Spark: epoch-nanos (~1.7e18) exceed double's
    * 2^53 exact range, so the cast-back can be off by ±1µs. And
    * `IntegralDivide` alone truncates toward zero, which for pre-1970
    * instants with non-integral micros lands one microsecond late — the
    * floor convention (Spark's own DateTimeUtils uses floorDiv) is
    * `(c - pmod(c, 1000)) div 1000`: pmod's non-negative remainder makes
    * the numerator exactly divisible, so the truncating divide IS floor.
    */
  def nanosToMicros(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val asLong = c.cast("long")
    GraftBridge.column(new IntegralDivide(
      GraftBridge.expression(asLong - pmod(asLong, lit(1000L))),
      GraftBridge.expression(lit(1000L))))
  }

  /** Epoch nanos → timestamp (micros truncation, matching the reference's
    * DateTimeUtils nanos path: SINK/converter/DateTimeUtils.java:27-115).
    */
  def timestampFromNanos(c: Column): Column =
    timestamp_micros(nanosToMicros(c))
}
