package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Queryable offset / schema-history parity tables (T2/T3 companions).
  *
  * Structured Streaming's checkpoint is the authoritative offset store in
  * graft; these tables re-express the reference's queryable drop-in
  * storage so operators can inspect pipeline state with plain SQL:
  *
  *  - offsets: single-row overwrite per save, schema (id, offset_data,
  *    record_insert_ts) — SINK/offset/IcebergOffsetBackingStore.java:69-73,
  *    193-230 (overwrite-by-alwaysTrue of one JSON blob row)
  *  - schema history: append-only records replayed in insert-ts order —
  *    SINK/history/IcebergSchemaHistory.java:68-72,134-177
  */
object ParityStores {

  val OffsetTable = "_debezium_offset_storage"
  val HistoryTable = "_debezium_database_history_storage"

  private val mapper = new ObjectMapper()

  private val storeSchema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("offset_data", StringType),
    StructField("record_insert_ts", TimestampType)))

  private val historySchema = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("history_data", StringType),
    StructField("record_insert_ts", TimestampType)))

  /** One store row as a JSON line for the driver-side commit path (no
    * Spark job — these tables hold single-digit rows; a scheduled job per
    * offset flush would dominate trickle-batch latency).
    */
  private def jsonRow(dataCol: String, json: String): String = {
    val n = mapper.createObjectNode()
    n.put("id", java.util.UUID.randomUUID().toString)
    n.put(dataCol, json)
    n.put("record_insert_ts", java.time.Instant.now().toString)
    mapper.writeValueAsString(n)
  }

  private val jsonProps = Map("write.format-default" -> "json")

  /** Overwrite the single offset row with the given key→value map as JSON
    * (the reference's overwriteByRowFilter(alwaysTrue) commit).
    */
  def saveOffsets(spark: SparkSession, warehouse: String,
                  data: Map[String, String], table: String = OffsetTable): Unit = this.synchronized {
    val node = mapper.createObjectNode()
    data.foreach { case (k, v) => node.put(k, v) }
    val t = ManagedTable.loadOrCreate(spark, warehouse, table, storeSchema,
      properties = jsonProps)
    t.commitLocalJson(
      Seq(jsonRow("offset_data", mapper.writeValueAsString(node))), overwrite = true)
  }

  /** Latest committed offsets, or None before the first save. */
  def loadOffsets(spark: SparkSession, warehouse: String,
                  table: String = OffsetTable): Option[Map[String, String]] =
    ManagedTable.load(spark, warehouse, table).flatMap { t =>
      t.read().orderBy(col("record_insert_ts").desc).limit(1)
        .select("offset_data").collect().headOption.map { r =>
        val node = mapper.readTree(r.getString(0))
        node.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap
      }
    }

  /** Append one schema-history record (reference storeRecord). */
  def storeHistoryRecord(spark: SparkSession, warehouse: String,
                         historyData: String, table: String = HistoryTable): Unit = this.synchronized {
    val t = ManagedTable.loadOrCreate(spark, warehouse, table, historySchema,
      properties = jsonProps)
    t.commitLocalJson(Seq(jsonRow("history_data", historyData)), overwrite = false)
  }

  /** All history records in insert order (reference recoverRecords reads
    * ordered by record_insert_ts; here the table's commit sequence is the
    * primary key — wall-clock timestamps tie under same-tick commits and
    * would replay DDL out of order).
    */
  def recoverHistory(spark: SparkSession, warehouse: String,
                     table: String = HistoryTable): Seq[String] =
    ManagedTable.load(spark, warehouse, table).map { t =>
      t.readWithCommitSeq()
        .orderBy(col(ManagedTable.SeqCol), col("record_insert_ts"))
        .select("history_data").collect().map(_.getString(0)).toSeq
    }.getOrElse(Seq.empty)
}
