package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Parsed Kafka-Connect JSON schema node, as embedded in Debezium change
  * events under `{"schema": ..., "payload": ...}` envelopes.
  *
  * Reference behavior being re-expressed: the json-format schema walk of
  * SINK/converter/JsonSchemaConverter.java:66-166 (field recursion) and
  * :282-396 (primitive dispatch). We parse the same shape:
  * `{"type":"struct","fields":[{"field":"id","type":"int32",
  * "optional":false,"name":"<logical>","parameters":{...}}, ...]}`
  * with `items` for arrays and `keys`/`values` for maps.
  */
final case class ConnectSchema(
    `type`: String,
    fieldName: Option[String],       // "field" when nested in a struct
    optional: Boolean,
    logicalName: Option[String],     // "name": logical type annotation
    parameters: Map[String, String], // e.g. decimal scale / precision
    fields: Seq[ConnectSchema],      // struct children
    items: Option[ConnectSchema],    // array element
    keys: Option[ConnectSchema],     // map key
    values: Option[ConnectSchema]    // map value
) {
  def isStruct: Boolean = `type` == "struct"
  def field(name: String): Option[ConnectSchema] =
    fields.find(_.fieldName.contains(name))
  def fieldNames: Seq[String] = fields.flatMap(_.fieldName)
}

object ConnectSchema {
  private val mapper = new ObjectMapper()

  /** Parse the `schema` node of a Debezium json envelope. */
  def parse(json: String): ConnectSchema = {
    require(json != null && json.trim.nonEmpty,
      "event carries no embedded schema (null/empty `schema` node) — " +
        "is `format.value.schemas.enable` off, or is the envelope corrupt?")
    fromNode(mapper.readTree(json))
  }

  def fromNode(n: JsonNode): ConnectSchema = {
    def opt(name: String): Option[JsonNode] =
      Option(n.get(name)).filterNot(_.isNull)
    ConnectSchema(
      `type` = opt("type").map(_.asText).getOrElse("string"),
      fieldName = opt("field").map(_.asText),
      optional = opt("optional").forall(_.asBoolean(true)),
      logicalName = opt("name").map(_.asText),
      parameters = opt("parameters")
        .map(p => p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      fields = opt("fields")
        .map(_.elements().asScala.map(fromNode).toSeq)
        .getOrElse(Seq.empty),
      items = opt("items").map(fromNode),
      keys = opt("keys").map(fromNode),
      values = opt("values").map(fromNode)
    )
  }

  /** Stable hash of the raw schema JSON — used to group a batch's events by
    * schema before evolution, mirroring the reference's group-by-
    * SchemaConverter trick (SINK/tableoperator/IcebergTableOperator.java:177-182).
    */
  def schemaHash(json: String): Int = json.hashCode
}

/** Debezium logical type names dispatched during schema mapping
  * (reference: SINK/converter/JsonSchemaConverter.java:282-396).
  */
object LogicalNames {
  val DebeziumDate = "io.debezium.time.Date"
  val ConnectDate = "org.apache.kafka.connect.data.Date"
  val ConnectTimestamp = "org.apache.kafka.connect.data.Timestamp"
  val DebeziumTimestamp = "io.debezium.time.Timestamp" // epoch millis
  val MicroTimestamp = "io.debezium.time.MicroTimestamp"
  val NanoTimestamp = "io.debezium.time.NanoTimestamp"
  val ZonedTimestamp = "io.debezium.time.ZonedTimestamp" // ISO string with offset
  val IsoDate = "io.debezium.time.IsoDate"
  val IsoTimestamp = "io.debezium.time.IsoTimestamp" // ISO string, no offset
  val IsoTime = "io.debezium.time.IsoTime"
  val MicroTime = "io.debezium.time.MicroTime"
  val NanoTime = "io.debezium.time.NanoTime"
  val ConnectTime = "org.apache.kafka.connect.data.Time"
  val Uuid = "io.debezium.data.Uuid"
  val ConnectDecimal = "org.apache.kafka.connect.data.Decimal"
  val Json = "io.debezium.data.Json"

  val timeTypes: Set[String] =
    Set(IsoTime, MicroTime, NanoTime, ConnectTime)
}
