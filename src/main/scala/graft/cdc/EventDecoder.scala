package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Inference result for one destination's events within a batch. */
final case class InferredEventSchema(
    specs: Seq[FieldSpec],
    identifierFields: Seq[String],
    isSchemaChangeEvent: Boolean,
    isUnflattened: Boolean,
    preserveRequired: Boolean = false
) {
  /** Wire-shape schema handed to from_json. */
  def rawSchema: StructType = SchemaMapping.rawStructType(specs)

  /** Target table schema; identifier fields are forced required. By
    * default every non-identifier field is optional regardless of the
    * connect schema's flag; `preserve-required-property` keeps the
    * source's required flags instead (reference:
    * SINK/converter/JsonSchemaConverter.java:83-84,163,
    * SINK/IcebergConfig.java:98-100).
    */
  def tableSchema: StructType = StructType(
    SchemaMapping.typedStructType(specs).map { f =>
      if (identifierFields.contains(f.name)) f.copy(nullable = false)
      else if (preserveRequired) f
      else f.copy(nullable = true)
    })
}

/** Envelope → typed rows, Spark-first.
  *
  * The reference walks each event's embedded schema node and converts
  * record-at-a-time (SINK/converter/JsonEventConverter.java:56-82,165-174,
  * 224-415). Here schema inference happens once per distinct schema string
  * (driver-side, metadata-only) and the data path is a single
  * `from_json` + native column expressions — whole-stage codegen end to end.
  */
object EventDecoder {

  /** Fields whose presence marks an un-flattened Debezium envelope; such
    * events may not have identifier fields
    * (SINK/converter/JsonSchemaConverter.java:240-253).
    */
  private val unflattenedMarkers = Set("before", "after", "source", "op")

  /** Fields marking a schema-change (DDL) event → append-only, no PK
    * (C8; SINK/converter/JsonEventConverter.java:183-185).
    */
  private val schemaChangeMarkers = Set("ddl", "databaseName", "tableChanges")

  /** Infer from the distinct value-schema JSONs (merged union-by-name) and
    * the key-schema JSON of a destination's batch slice.
    */
  def infer(
      valueSchemaJsons: Seq[String],
      keySchemaJson: Option[String],
      cfg: SchemaMappingConfig = SchemaMappingConfig()
  ): InferredEventSchema = {
    // Corrupt envelopes surface as null schema extractions — drop them here
    // (the data path parses them to null rows under PERMISSIVE mode) but
    // fail loudly if NOTHING in the batch carried a schema.
    val usable = valueSchemaJsons.filter(s => s != null && s.trim.nonEmpty)
    require(usable.nonEmpty,
      s"no usable embedded value schema among ${valueSchemaJsons.size} distinct envelope(s)")
    val parsed = usable.map(ConnectSchema.parse)
    val specLists = parsed.map(SchemaMapping.structFields(_, cfg))
    val specs = specLists.reduce(mergeSpecs)

    val names = specs.map(_.name).toSet
    val isSchemaChange = schemaChangeMarkers.subsetOf(names)
    val isUnflattened =
      unflattenedMarkers.subsetOf(names) && !names.contains(CdcMeta.Op)

    // PK fields come from the event *key* schema; map/array keys rejected
    // (SINK/converter/JsonSchemaConverter.java:110-141).
    val ids: Seq[String] =
      if (isSchemaChange || isUnflattened || cfg.nestedAsVariant) Seq.empty
      else keySchemaJson.map { kj =>
        val ks = ConnectSchema.parse(kj)
        ks.fields.collect {
          case f if f.fieldName.isDefined =>
            require(f.`type` != "map" && f.`type` != "array",
              s"identifier field ${f.fieldName.get} may not be a map/array")
            f.fieldName.get
        }
      }.getOrElse(Seq.empty).filter(names.contains)

    InferredEventSchema(specs, ids, isSchemaChange, isUnflattened,
      preserveRequired = cfg.preserveRequired)
  }

  /** Union-by-name with safe promotion (int→long, float→double), mirroring
    * Iceberg's unionByNameWith as used in
    * SINK/tableoperator/IcebergTableOperator.java:136-151.
    */
  def mergeSpecs(a: Seq[FieldSpec], b: Seq[FieldSpec]): Seq[FieldSpec] = {
    val byName = a.map(s => s.name -> s).toMap
    val merged = a.map { sa =>
      b.find(_.name == sa.name).map(sb => promote(sa, sb)).getOrElse(sa)
    }
    merged ++ b.filterNot(s => byName.contains(s.name))
  }

  private def promote(a: FieldSpec, b: FieldSpec): FieldSpec =
    (a.typed, b.typed) match {
      case (x, y) if x == y       => a
      case (IntegerType, LongType)  => b
      case (LongType, IntegerType)  => a
      case (FloatType, DoubleType)  => b
      case (DoubleType, FloatType)  => a
      case _                        => a // incompatible: first writer wins
    }

  /** Decode a batch slice: `envelopeCol` holds the full
    * `{"schema":...,"payload":...}` JSON string. One from_json pass parses
    * the payload subtree with the wire schema; conversion expressions then
    * produce the typed columns. Extra event fields NOT in `specs` are
    * dropped and missing fields become null — the schema-conforming
    * projection R4 (SINK/converter/JsonEventConverter.java:224-238).
    */
  def decode(df: DataFrame, inferred: InferredEventSchema, envelopeCol: String = "value"): DataFrame = {
    val env = StructType(Seq(StructField("payload", inferred.rawSchema)))
    val payload = from_json(col(envelopeCol), env).getField("payload")
    df.select(typedColumns(payload, inferred.specs): _*)
  }

  /** Same, but keeps passthrough columns (e.g. destination) alongside. */
  def decodeKeeping(df: DataFrame, inferred: InferredEventSchema,
                    keep: Seq[String], envelopeCol: String = "value"): DataFrame = {
    val env = StructType(Seq(StructField("payload", inferred.rawSchema)))
    val payload = from_json(col(envelopeCol), env).getField("payload")
    df.select(keep.map(col) ++ typedColumns(payload, inferred.specs): _*)
  }

  private def typedColumns(payload: Column, specs: Seq[FieldSpec]): Seq[Column] =
    specs.map(s => s.convert(payload.getField(s.name)).as(s.name))

  /** Conform a typed DataFrame to a target table schema: missing columns →
    * typed nulls, extra columns dropped, order normalized (R4). Type drift
    * toward a timestamp column goes through the temporal-precision-mode
    * fallback instead of a bare cast (see [[SchemaMapping.coerceTo]]).
    */
  def conformTo(df: DataFrame, table: StructType,
                mode: TemporalMode = TemporalMode.IsoString): DataFrame = {
    val present = df.columns.toSet
    df.select(table.fields.toSeq.map { f =>
      if (present.contains(f.name))
        SchemaMapping.coerceTo(col(f.name), df.schema(f.name).dataType, f.dataType, mode).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
