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
    * The only non-codegen scalar in the layer — a deliberate UDF fallback
    * per SURVEY §7.3; it sits off the hot path (precise decimal columns
    * only) and is a candidate for a custom Expression with doGenCode later.
    */
  def decimalFromBase64(c: Column, precision: Int, scale: Int): Column = {
    val dec = udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
    }
    dec(unbase64(c)).cast(DecimalType(precision, scale))
  }

  /** Epoch nanos → timestamp (micros truncation, matching the reference's
    * DateTimeUtils nanos path: SINK/converter/DateTimeUtils.java:27-115).
    */
  def timestampFromNanos(c: Column): Column =
    timestamp_micros((c / lit(1000L)).cast("long"))
}
