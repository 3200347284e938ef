package graft.cdc

import graft.tables.ManagedTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graft as a CDC SOURCE: export a table's committed changes as
  * Debezium-style JSON envelopes — the exact shape [[EventDecoder]] (and
  * the reference's json consumer, SINK/converter/JsonEventConverter.java)
  * ingests, closing the loop: a downstream graft (or debezium-server)
  * pipeline can follow an upstream graft table with no custom protocol.
  *
  * Rows come from [[ManagedTable.readChangesBetween]] — O(changes),
  * manifest-filtered — and carry `__op` = `u` (upsert winner) or `d`
  * (tombstone) plus `__source_ts_ms` = the COMMIT SEQUENCE, which is
  * monotone per key, so replaying the feed through the standard dedup
  * (C2) reconstructs the exact fold with no wall-clock tie hazard.
  * Timestamps export as Debezium logical
  * types (epoch micros + `io.debezium.time.MicroTimestamp`), dates as
  * epoch days — the decode path's own conventions (F5–F8).
  *
  * Scalar, array-of-scalar and struct-of-scalar columns are supported —
  * the same surface the envelope decoder round-trips.
  */
object ChangeFeed {

  private def connectType(dt: DataType): (String, Option[String]) = dt match {
    case ByteType => ("int8", None)
    case ShortType => ("int16", None)
    case IntegerType => ("int32", None)
    case LongType => ("int64", None)
    case FloatType => ("float32", None)
    case DoubleType => ("float64", None)
    case BooleanType => ("boolean", None)
    case StringType => ("string", None)
    case BinaryType => ("bytes", None)
    case DateType => ("int32", Some(LogicalNames.DebeziumDate))
    // tz-aware → ZonedTimestamp (ISO string with offset, decodes back to
    // TimestampType); wall-clock NTZ → MicroTimestamp (decodes to NTZ)
    case _: TimestampType => ("string", Some(LogicalNames.ZonedTimestamp))
    case _: TimestampNTZType => ("int64", Some(LogicalNames.MicroTimestamp))
    case d: DecimalType => ("string", None) // exported as plain string
    case _ => throw new IllegalArgumentException(
      s"unsupported export type ${dt.catalogString}")
  }

  private def fieldNode(mapper: com.fasterxml.jackson.databind.ObjectMapper,
                        name: String, dt: DataType, optional: Boolean,
                        nested: Boolean = false)
      : com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("field", name)
    n.put("optional", optional)
    dt match {
      case s: StructType =>
        n.put("type", "struct")
        val fs = n.putArray("fields")
        s.fields.foreach(f =>
          fs.add(fieldNode(mapper, f.name, f.dataType, f.nullable, nested = true)))
      case a: ArrayType =>
        n.put("type", "array")
        val item = fieldNode(mapper, "item", a.elementType, a.containsNull, nested = true)
        item.remove("field")
        n.set[com.fasterxml.jackson.databind.JsonNode]("items", item)
      case other =>
        // payload conversion (epoch days/micros, decimal-as-string) only
        // runs on TOP-LEVEL columns; a nested temporal/decimal would
        // export as to_json's ISO text while the schema promises the
        // converted form — refuse instead of emitting a lying schema
        if (nested) other match {
          case DateType | _: TimestampType | _: TimestampNTZType | _: DecimalType =>
            throw new IllegalArgumentException(
              s"unsupported nested export type ${other.catalogString} in '$name' " +
                "(dates/timestamps/decimals are supported at the top level only)")
          case _ => ()
        }
        val (t, logical) = connectType(other)
        n.put("type", t)
        logical.foreach(n.put("name", _))
    }
    n
  }

  /** The Connect schema JSON for a struct of `fields` (+ the CDC meta
    * columns when `withMeta`).
    */
  private[cdc] def connectSchemaJson(fields: Seq[StructField],
                                     withMeta: Boolean): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    val fs = root.putArray("fields")
    fields.foreach(f => fs.add(fieldNode(mapper, f.name, f.dataType, f.nullable)))
    if (withMeta) {
      fs.add(fieldNode(mapper, CdcMeta.Op, StringType, optional = true))
      fs.add(fieldNode(mapper, CdcMeta.SourceTsMs, LongType, optional = true))
    }
    mapper.writeValueAsString(root)
  }

  /** A column's payload representation under the export conventions. */
  private def payloadCol(f: StructField): Column = f.dataType match {
    case DateType => datediff(col(f.name), lit("1970-01-01")).as(f.name)
    case _: TimestampType =>
      date_format(col(f.name), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").as(f.name)
    case _: TimestampNTZType =>
      unix_micros(col(f.name).cast(TimestampType)).as(f.name)
    case _: DecimalType => col(f.name).cast(StringType).as(f.name)
    case _ => col(f.name)
  }

  /** Envelope rows (`destination`, `key`, `value`) for the changes in
    * versions (fromVersion, toVersion] of `table`.
    */
  def envelopes(table: ManagedTable, fromVersion: Long, toVersion: Long,
                destination: String): DataFrame = {
    // a CDC-built source table carries its OWN __op / __source_ts_ms
    // columns; the feed re-derives both (op from tombstones, sequence
    // from the commit), so the stored ones are excluded rather than
    // exported twice
    val schema = StructType(table.meta.schema.fields.filterNot(f =>
      f.name == CdcMeta.Op || f.name == CdcMeta.SourceTsMs))
    val ids = table.meta.identifierFields
    require(ids.nonEmpty, "change-feed export needs a keyed table")
    require(ids.forall(schema.fieldNames.contains),
      "identifier fields may not be CDC meta columns")
    val keyFields = schema.fields.filter(f => ids.contains(f.name)).toSeq
    val valueSchemaJson = connectSchemaJson(schema.fields.toSeq, withMeta = true)
    val keySchemaJson = connectSchemaJson(
      keyFields.map(_.copy(nullable = false)), withMeta = false)
    val changes = table.readChangesBetween(fromVersion, toVersion)
    val payload = struct(
      schema.fields.toSeq.map(payloadCol) :+
        when(col(ManagedTable.TombstoneCol), lit("d")).otherwise(lit("u"))
          .as(CdcMeta.Op) :+
        col(ManagedTable.SeqCol).as(CdcMeta.SourceTsMs): _*)
    changes.select(
      lit(destination).as("destination"),
      concat(lit(s"""{"schema":$keySchemaJson,"payload":"""),
        to_json(struct(keyFields.map(f => payloadCol(f)): _*)),
        lit("}")).as("key"),
      concat(lit(s"""{"schema":$valueSchemaJson,"payload":"""),
        to_json(payload),
        lit("}")).as("value"))
  }
}
