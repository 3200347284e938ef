package graft.cdc

import graft.SharedSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CdcCoreSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val cfg = SchemaMappingConfig()

  test("schema inference: customers envelope → StructType with PK") {
    val inf = EventDecoder.infer(Seq(EventFactory.customerValueSchema),
      Some(EventFactory.customerKeySchema), cfg)
    assert(inf.identifierFields == Seq("id"))
    val t = inf.tableSchema
    assert(t("id").dataType == IntegerType && !t("id").nullable)
    assert(t("first_name").dataType == StringType && t("first_name").nullable)
    assert(t("__source_ts_ns").dataType == LongType)
    assert(t("__source_ts_ms").dataType == TimestampType) // F9 special-case
    assert(t("__deleted").dataType == BooleanType)
  }

  test("map/array identifier fields are refused (JsonSchemaConverter.java:110-141 parity)") {
    // the reference rejects key-schema fields of MAP/ARRAY type outright —
    // such a key has no stable equality for upsert identity
    val mapKey =
      """{"type":"struct","fields":[{"field":"attrs","type":"map",
        |"keys":{"type":"string","optional":false},
        |"values":{"type":"string","optional":true},"optional":false}]}"""
        .stripMargin.replaceAll("\n", "")
    val arrKey =
      """{"type":"struct","fields":[{"field":"ids","type":"array",
        |"items":{"type":"int32","optional":false},"optional":false}]}"""
        .stripMargin.replaceAll("\n", "")
    for (bad <- Seq(mapKey, arrKey)) {
      val e = intercept[IllegalArgumentException] {
        EventDecoder.infer(Seq(EventFactory.customerValueSchema), Some(bad), cfg)
      }
      assert(e.getMessage.contains("may not be a map/array"), e.getMessage)
    }
    // a scalar key field rides along untouched next to the same value schema
    assert(EventDecoder.infer(Seq(EventFactory.customerValueSchema),
      Some(EventFactory.customerKeySchema), cfg).identifierFields == Seq("id"))
  }

  test("decode: envelope json → typed row values") {
    val (d, k, v) = EventFactory.event(1, "alice", "c", 1577840461000000001L)
    val df = Seq((d, k, v)).toDF("destination", "key", "value")
    val inf = EventDecoder.infer(Seq(EventFactory.customerValueSchema), Some(EventFactory.customerKeySchema), cfg)
    val out = EventDecoder.decode(df, inf).collect().head
    assert(out.getAs[Int]("id") == 1)
    assert(out.getAs[String]("first_name") == "alice")
    assert(out.getAs[String]("__op") == "c")
    assert(out.getAs[Long]("__source_ts_ns") == 1577840461000000001L)
    // __source_ts_ms is epoch millis → timestamptz: 2020-01-01 01:01:01 UTC
    assert(out.getAs[java.sql.Timestamp]("__source_ts_ms").toInstant.toEpochMilli == 1577840461000L)
  }

  test("all-datatypes conversion matrix (§1.3)") {
    val payload =
      """{"c_id":7,"c_text":"t","c_date":18262,"c_iso_date":"2019-07-09",
        |"c_ts_micro":1562639337123456,"c_ts_milli":1562639337123,
        |"c_ts_zoned":"2019-07-09T02:28:57.123456Z",
        |"c_float":1.5,"c_double":2.25,"c_bool":true,
        |"c_uuid":"3f1e4a2e-7c56-4b54-a1b0-5f4f2f2f2f2f",
        |"c_bytes":"aGVsbG8=",
        |"c_decimal":"BNI=",
        |"c_array":[1,2,3],"c_map":{"a":"x"},"c_struct":{"n":5,"s":"in"},
        |"__op":"r","__source_ts_ms":1562639337123}""".stripMargin.replaceAll("\n", "")
    val v = s"""{"schema":${EventFactory.dataTypesValueSchema},"payload":$payload}"""
    val df = Seq(("d", "", v)).toDF("destination", "key", "value")
    val inf = EventDecoder.infer(Seq(EventFactory.dataTypesValueSchema), None, cfg)
    val t = inf.tableSchema
    assert(t("c_date").dataType == DateType)
    assert(t("c_iso_date").dataType == DateType)
    assert(t("c_ts_micro").dataType == TimestampNTZType)
    assert(t("c_ts_milli").dataType == TimestampNTZType)
    assert(t("c_ts_zoned").dataType == TimestampType)
    assert(t("c_decimal").dataType == DecimalType(18, 2))
    assert(t("c_struct").dataType.isInstanceOf[StructType])

    val r = EventDecoder.decode(df, inf).collect().head
    assert(r.getAs[java.sql.Date]("c_date").toString == "2020-01-01")
    assert(r.getAs[java.sql.Date]("c_iso_date").toString == "2019-07-09")
    assert(r.getAs[java.time.LocalDateTime]("c_ts_micro").toString == "2019-07-09T02:28:57.123456")
    assert(r.getAs[java.time.LocalDateTime]("c_ts_milli").toString == "2019-07-09T02:28:57.123")
    assert(r.getAs[java.sql.Timestamp]("c_ts_zoned").toInstant.toString == "2019-07-09T02:28:57.123456Z")
    assert(r.getAs[Float]("c_float") == 1.5f)
    assert(new String(r.getAs[Array[Byte]]("c_bytes"), "UTF-8") == "hello")
    // 0x04D2 = 1234 unscaled, scale 2 → 12.34
    assert(r.getAs[java.math.BigDecimal]("c_decimal").toPlainString == "12.34")
    assert(r.getAs[scala.collection.Seq[Int]]("c_array") == Seq(1, 2, 3))
    assert(r.getAs[Map[String, String]]("c_map") == Map("a" -> "x"))
    assert(r.getAs[org.apache.spark.sql.Row]("c_struct").getAs[Long]("n") == 5L)
  }

  test("schema merge: union-by-name with int→long, float→double promotion") {
    val s1 = """{"type":"struct","fields":[{"field":"a","type":"int32"},{"field":"b","type":"float32"}]}"""
    val s2 = """{"type":"struct","fields":[{"field":"a","type":"int64"},{"field":"b","type":"float64"},{"field":"c","type":"string"}]}"""
    val inf = EventDecoder.infer(Seq(s1, s2), None, cfg)
    val t = inf.tableSchema
    assert(t("a").dataType == LongType)
    assert(t("b").dataType == DoubleType)
    assert(t("c").dataType == StringType)
    assert(t.fieldNames.toSeq == Seq("a", "b", "c"))
  }

  test("unflattened envelope refuses identifier fields") {
    val s = """{"type":"struct","fields":[
      |{"field":"before","type":"struct","fields":[{"field":"id","type":"int32"}],"optional":true},
      |{"field":"after","type":"struct","fields":[{"field":"id","type":"int32"}],"optional":true},
      |{"field":"source","type":"struct","fields":[{"field":"db","type":"string"}]},
      |{"field":"op","type":"string"}]}""".stripMargin.replaceAll("\n", "")
    val inf = EventDecoder.infer(Seq(s), Some(EventFactory.customerKeySchema), cfg)
    assert(inf.isUnflattened && inf.identifierFields.isEmpty)
  }

  test("dedup C2: last-per-key by (ts desc, op priority desc, arrival desc)") {
    val events = Seq(
      EventFactory.event(1, "a1", "c", 100L),
      EventFactory.event(1, "a2", "u", 200L), // wins for id=1 (later ts)
      EventFactory.event(2, "b1", "c", 100L),
      EventFactory.event(2, "b2", "d", 100L), // same ts: delete priority wins
      EventFactory.event(3, "c1", "u", 100L), // same ts+prio tie: LATEST
      EventFactory.event(3, "c2", "u", 100L)  //   arrival (c2) wins, like the
    )                                         //   reference's merge fold
    val df = events.toDF("destination", "key", "value")
    val inf = EventDecoder.infer(Seq(EventFactory.customerValueSchema), Some(EventFactory.customerKeySchema), cfg)
    val typed = Dedup.withArrivalIndex(EventDecoder.decode(df, inf))
    val out = Dedup.deduplicate(typed, Seq("id"))
      .select("id", "first_name", "__op").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1, "a2", "u"), (2, "b2", "d"), (3, "c2", "u")))
  }

  test("upsert C3/C4 soft delete: deleted row retained with __op='d'") {
    val inf = EventDecoder.infer(Seq(EventFactory.customerValueSchema), Some(EventFactory.customerKeySchema), cfg)
    val target = EventDecoder.decode(
      Seq(EventFactory.event(1, "old", "c", 50L), EventFactory.event(9, "keep", "c", 50L))
        .toDF("destination", "key", "value"), inf)
    val batch = EventDecoder.decode(Seq(
      EventFactory.event(1, "new", "u", 100L),
      EventFactory.event(2, "gone", "d", 100L)
    ).toDF("destination", "key", "value"), inf)
    val out = CdcApply.upsert(target, batch, Seq("id"),
      CdcApply.UpsertConfig(keepDeletes = true))
      .select("id", "first_name", "__op").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((1, "new", "u"), (2, "gone", "d"), (9, "keep", "c")))
  }

  test("upsert C5 hard delete: absent-key delete and insert-then-delete net to zero") {
    val inf = EventDecoder.infer(Seq(EventFactory.customerValueSchema), Some(EventFactory.customerKeySchema), cfg)
    val target = EventDecoder.decode(
      Seq(EventFactory.event(1, "old", "c", 50L)).toDF("destination", "key", "value"), inf)
    val batch = EventDecoder.decode(Seq(
      EventFactory.event(1, "upd", "u", 100L),
      EventFactory.event(4, null, "d", 100L),   // delete of never-present key
      EventFactory.event(5, "tmp", "c", 100L),  // insert...
      EventFactory.event(5, null, "d", 200L)    // ...then delete, same batch
    ).toDF("destination", "key", "value"), inf)
    val out = CdcApply.upsert(target, batch, Seq("id"),
      CdcApply.UpsertConfig(keepDeletes = false))
      .select("id", "first_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "upd")))
  }

  test("append C6: no-PK events accumulate") {
    val inf = EventDecoder.infer(Seq(EventFactory.customerValueSchema), None, cfg)
    assert(inf.identifierFields.isEmpty)
    val t0 = EventDecoder.decode(
      Seq(EventFactory.event(1, "v1", "c", 1L)).toDF("destination", "key", "value"), inf)
    val b = EventDecoder.decode(
      Seq(EventFactory.event(1, "v2", "u", 2L)).toDF("destination", "key", "value"), inf)
    assert(CdcApply.append(t0, b).count() == 2)
  }

  test("table mapper R6") {
    val m = DefaultTableMapper(prefix = "dbz_", replaceRegex = Some(("^testc\\.", "")))
    assert(m.map("testc.inventory.CUSTOMERS") == "dbz_inventory_customers")
  }

  test("conformTo R4: missing columns null-filled, extras dropped") {
    val df = Seq((1, "x", 9.9)).toDF("id", "name", "extra")
    val target = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("added", DateType)))
    val out = EventDecoder.conformTo(df, target)
    assert(out.schema.fieldNames.toSeq == Seq("id", "name", "added"))
    assert(out.collect().head.isNullAt(2))
  }

  test("temporal precision modes F7/F8: unannotated long → timestamp per mode") {
    import java.time.LocalDateTime
    import org.apache.spark.sql.functions.{col, unix_micros, unix_millis}
    // 2021-01-01T00:00:01.500 in epoch micros
    val us = 1609459201500000L
    val df = Seq(Tuple1(us)).toDF("t")
    val ntz = StructType(Seq(StructField("t", TimestampNTZType)))
    def conformed(m: TemporalMode): LocalDateTime =
      EventDecoder.conformTo(df, ntz, m).collect().head
        .getAs[LocalDateTime](0)
    // isostring (reference default arm) + micro: value read as micros
    assert(conformed(TemporalMode.IsoString) == LocalDateTime.parse("2021-01-01T00:00:01.500"))
    assert(conformed(TemporalMode.Micro) == LocalDateTime.parse("2021-01-01T00:00:01.500"))
    // nanoseconds: value read as nanos (integral division to micros)
    assert(conformed(TemporalMode.Nano) == LocalDateTime.parse("1970-01-19T15:04:19.201500"))
    // connect: value read as millis
    assert(conformed(TemporalMode.Connect).getYear > 50000) // micros*1000 — far future
    // tz target: connect/isostring read as millis, micro as micros
    val tz = StructType(Seq(StructField("t", TimestampType)))
    val millisIn = Seq(Tuple1(1609459201500L)).toDF("t") // same instant in millis
    val viaConnect = EventDecoder.conformTo(millisIn, tz, TemporalMode.Connect)
      .select(unix_millis(col("t"))).collect().head.getLong(0)
    assert(viaConnect == 1609459201500L)
    val viaIso = EventDecoder.conformTo(millisIn, tz, TemporalMode.IsoString)
      .select(unix_millis(col("t"))).collect().head.getLong(0)
    assert(viaIso == 1609459201500L)
    val viaMicro = EventDecoder.conformTo(Seq(Tuple1(us)).toDF("t"), tz, TemporalMode.Micro)
      .select(unix_micros(col("t"))).collect().head.getLong(0)
    assert(viaMicro == us)
    // config-string round trip
    for (m <- Seq(TemporalMode.IsoString, TemporalMode.Micro, TemporalMode.Nano, TemporalMode.Connect))
      assert(TemporalMode.fromString(TemporalMode.name(m)) == m)
  }

  test("F12 nested-as-variant: unflattened envelope decodes before/after to VariantType") {
    import org.apache.spark.sql.functions.{col, try_variant_get}
    import org.apache.spark.sql.types.VariantType
    // unflattened Debezium envelope: before/after/source structs + op
    val rowFields =
      """[{"field":"id","type":"int32","optional":false},
        |{"field":"first_name","type":"string","optional":true}]""".stripMargin.replaceAll("\n", "")
    val valueSchema =
      s"""{"type":"struct","fields":[
         |{"field":"before","type":"struct","optional":true,"fields":$rowFields},
         |{"field":"after","type":"struct","optional":true,"fields":$rowFields},
         |{"field":"source","type":"struct","optional":true,"fields":[
         |  {"field":"ts_ms","type":"int64","optional":true}]},
         |{"field":"op","type":"string","optional":false}
         |]}""".stripMargin.replaceAll("\n", "")
    def value(id: Int, name: String, op: String): String =
      s"""{"schema":$valueSchema,"payload":{"before":null,"after":{"id":$id,"first_name":"$name"},"source":{"ts_ms":100},"op":"$op"}}"""
    val df = Seq(
      ("testc.inventory.customers", s"""{"schema":${EventFactory.customerKeySchema},"payload":{"id":1}}""", value(1, "alice", "c")),
      ("testc.inventory.customers", s"""{"schema":${EventFactory.customerKeySchema},"payload":{"id":2}}""", value(2, "bob", "u"))
    ).toDF("destination", "key", "value")

    val inferred = EventDecoder.infer(Seq(valueSchema), Some(EventFactory.customerKeySchema),
      SchemaMappingConfig(nestedAsVariant = true))
    assert(inferred.isUnflattened, "before/after/source/op marks an unflattened envelope")
    assert(inferred.identifierFields.isEmpty, "variant tables are append-only by design")
    val decoded = EventDecoder.decode(df, inferred)
    assert(decoded.schema("after").dataType == VariantType,
      s"after must decode to VariantType, got ${decoded.schema("after").dataType}")
    assert(decoded.schema("before").dataType == VariantType)
    // the reference contract: try_variant_get reaches into the variant
    // (TEST/IcebergChangeConsumerVariantTest.java:50-53)
    val names = decoded
      .select(try_variant_get(col("after"), "$.first_name", "string").as("n"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(names == Seq("alice", "bob"))
    val ids = decoded
      .select(try_variant_get(col("after"), "$.id", "int").as("i"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(ids == Seq(1, 2))
  }

  test("preserve-required-property: default relaxes non-PK fields, true keeps source flags") {
    // name is required (optional=false) in the envelope schema but is NOT a PK
    val schemaJson =
      """{"type":"struct","fields":[
        |{"type":"int32","optional":false,"field":"id"},
        |{"type":"string","optional":false,"field":"name"},
        |{"type":"string","optional":true,"field":"note"}]}""".stripMargin
    val keyJson =
      """{"type":"struct","fields":[{"type":"int32","optional":false,"field":"id"}]}"""
    val relaxed = EventDecoder.infer(Seq(schemaJson), Some(keyJson))
    assert(!relaxed.tableSchema("id").nullable, "PK stays required")
    assert(relaxed.tableSchema("name").nullable,
      "default mode must relax non-PK required fields (JsonSchemaConverter.java:84)")
    val preserved = EventDecoder.infer(Seq(schemaJson), Some(keyJson),
      SchemaMappingConfig(preserveRequired = true))
    assert(!preserved.tableSchema("id").nullable)
    assert(!preserved.tableSchema("name").nullable, "preserve-required keeps source flag")
    assert(preserved.tableSchema("note").nullable)
  }
}
