package graft.cdc

/** Synthetic Debezium-style json events for tests — the Scala analogue of
  * the reference's TEST/converter/EventFactory.java:41-120 fixtures
  * (customers-style rows: id int32 PK, first_name string, __op,
  * __source_ts_ns, __deleted).
  */
object EventFactory {

  val customerValueSchema: String =
    """{"type":"struct","fields":[
      |{"field":"id","type":"int32","optional":false},
      |{"field":"first_name","type":"string","optional":true},
      |{"field":"__op","type":"string","optional":false},
      |{"field":"__source_ts_ns","type":"int64","optional":false},
      |{"field":"__source_ts_ms","type":"int64","optional":true},
      |{"field":"__deleted","type":"boolean","optional":true}
      |]}""".stripMargin.replaceAll("\n", "")

  val customerKeySchema: String =
    """{"type":"struct","fields":[{"field":"id","type":"int32","optional":false}]}"""

  def event(id: Int, name: String, op: String, tsNs: Long,
            destination: String = "testc.inventory.customers"): (String, String, String) = {
    val key = s"""{"schema":$customerKeySchema,"payload":{"id":$id}}"""
    val nameJson = if (name == null) "null" else s""""$name""""
    val value =
      s"""{"schema":$customerValueSchema,"payload":{"id":$id,"first_name":$nameJson,"__op":"$op","__source_ts_ns":$tsNs,"__source_ts_ms":${tsNs / 1000000L},"__deleted":${op == "d"}}}"""
    (destination, key, value)
  }

  /** All-datatypes value schema exercising the type-mapping table (§1.3). */
  val dataTypesValueSchema: String =
    """{"type":"struct","fields":[
      |{"field":"c_id","type":"int32","optional":false},
      |{"field":"c_text","type":"string","optional":true},
      |{"field":"c_date","type":"int32","name":"io.debezium.time.Date","optional":true},
      |{"field":"c_iso_date","type":"string","name":"io.debezium.time.IsoDate","optional":true},
      |{"field":"c_ts_micro","type":"int64","name":"io.debezium.time.MicroTimestamp","optional":true},
      |{"field":"c_ts_milli","type":"int64","name":"io.debezium.time.Timestamp","optional":true},
      |{"field":"c_ts_zoned","type":"string","name":"io.debezium.time.ZonedTimestamp","optional":true},
      |{"field":"c_float","type":"float32","optional":true},
      |{"field":"c_double","type":"float64","optional":true},
      |{"field":"c_bool","type":"boolean","optional":true},
      |{"field":"c_uuid","type":"string","name":"io.debezium.data.Uuid","optional":true},
      |{"field":"c_bytes","type":"bytes","optional":true},
      |{"field":"c_decimal","type":"bytes","name":"org.apache.kafka.connect.data.Decimal","parameters":{"scale":"2","connect.decimal.precision":"18"},"optional":true},
      |{"field":"c_array","type":"array","items":{"type":"int32"},"optional":true},
      |{"field":"c_map","type":"map","keys":{"type":"string"},"values":{"type":"string"},"optional":true},
      |{"field":"c_struct","type":"struct","optional":true,"fields":[
      |  {"field":"n","type":"int64","optional":true},
      |  {"field":"s","type":"string","optional":true}]},
      |{"field":"__op","type":"string","optional":false},
      |{"field":"__source_ts_ms","type":"int64","optional":true}
      |]}""".stripMargin.replaceAll("\n", "")
}
