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

  private def row(spark: SparkSession, schema: StructType, dataCol: String,
                  json: String): DataFrame = {
    import spark.implicits._
    Seq((java.util.UUID.randomUUID().toString, json))
      .toDF("id", dataCol)
      .withColumn("record_insert_ts", current_timestamp())
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Overwrite the single offset row with the given key→value map as JSON
    * (the reference's overwriteByRowFilter(alwaysTrue) commit).
    */
  def saveOffsets(spark: SparkSession, warehouse: String,
                  data: Map[String, String], table: String = OffsetTable): Unit = this.synchronized {
    val node = mapper.createObjectNode()
    data.foreach { case (k, v) => node.put(k, v) }
    val t = ManagedTable.loadOrCreate(spark, warehouse, table, storeSchema)
    t.overwrite(row(spark, storeSchema, "offset_data", mapper.writeValueAsString(node)))
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
    val t = ManagedTable.loadOrCreate(spark, warehouse, table, historySchema)
    t.append(row(spark, historySchema, "history_data", historyData))
  }

  /** All history records in insert order (reference recoverRecords reads
    * ordered by record_insert_ts).
    */
  def recoverHistory(spark: SparkSession, warehouse: String,
                     table: String = HistoryTable): Seq[String] =
    ManagedTable.load(spark, warehouse, table).map { t =>
      t.read().orderBy(col("record_insert_ts"), col("id"))
        .select("history_data").collect().map(_.getString(0)).toSeq
    }.getOrElse(Seq.empty)
}
