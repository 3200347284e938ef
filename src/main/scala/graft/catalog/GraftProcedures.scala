package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.tables.{Maintenance, ManagedTable}

/** `CALL <cat>.system.<proc>(…)` through Spark's NATIVE stored-procedure
  * resolution (the V2 `ProcedureCatalog` API, Spark 4) — the same nine
  * maintenance verbs the graft SQL surface exposes at its parser seam
  * (`CALL graft.system.…`), each a thin dispatcher onto the ONE
  * [[ManagedTable]] implementation: compact / compact_minor /
  * materialize_position_deletes / expire_snapshots / rollback_to_version /
  * maintenance / replicate / remove_orphan_files / publish_branch.
  * Spark owns the grammar, argument coercion, and named-argument
  * resolution here; results come back as driver-local scans of
  * informational rows, exactly like the SQL surface's eager commands
  * (and Iceberg's procedures). Every verb is manifest/metadata-scale to
  * PLAN — the heavy ones (compact) run the same distributed rewrite the
  * API runs.
  */
object GraftProcedures {

  val Names: Seq[String] = Seq(
    "compact", "compact_minor", "materialize_position_deletes",
    "expire_snapshots", "rollback_to_version", "maintenance",
    "replicate", "remove_orphan_files", "publish_branch")

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** TimestampType argument arrives as micros-since-epoch; the table
    * layer's cutoffs are millis.
    */
  private def millisOf(micros: Long): Long = Math.floorDiv(micros, 1000L)

  def load(spark: SparkSession, warehouse: String, proc: String): Option[UnboundProcedure] = {
    def table(name: String): ManagedTable =
      ManagedTable.load(spark, warehouse, name).getOrElse(
        throw new IllegalArgumentException(s"table '$name' does not exist in $warehouse"))
    val lower = proc.toLowerCase(java.util.Locale.ROOT)
    val spec: Option[(Seq[ProcedureParameter], StructType, InternalRow => Seq[InternalRow])] =
      lower match {
        case "compact" => Some((
          Seq(in("table", StringType)),
          StructType(Seq(StructField("files_before", LongType, nullable = false),
            StructField("files_after", LongType, nullable = false))),
          row => { val (b, a) = table(row.getUTF8String(0).toString).compact()
                   Seq(InternalRow(b, a)) }))
        case "compact_minor" => Some((
          Seq(in("table", StringType)),
          StructType(Seq(StructField("trickle_groups_before", LongType, nullable = false),
            StructField("trickle_groups_after", LongType, nullable = false))),
          row => { val (b, a) = table(row.getUTF8String(0).toString).compactMinor()
                   Seq(InternalRow(b.toLong, a.toLong)) }))
        case "materialize_position_deletes" => Some((
          Seq(in("table", StringType)),
          StructType(Seq(StructField("pairs", LongType, nullable = false))),
          row => Seq(InternalRow(
            table(row.getUTF8String(0).toString).materializePositionalDeletes()))))
        case "expire_snapshots" => Some((
          Seq(in("table", StringType), in("older_than", TimestampType)),
          StructType(Seq(StructField("expired", LongType, nullable = false))),
          row => Seq(InternalRow(table(row.getUTF8String(0).toString)
            .expireSnapshots(millisOf(row.getLong(1))).toLong))))
        case "rollback_to_version" => Some((
          Seq(in("table", StringType), in("version", LongType)),
          StructType(Seq(StructField("current_version", LongType, nullable = false))),
          row => { val t = table(row.getUTF8String(0).toString)
                   t.rollbackTo(row.getLong(1))
                   Seq(InternalRow(t.meta.currentVersion)) }))
        case "maintenance" => Some((
          Seq(in("table", StringType)),
          StructType(Seq(StructField("action", StringType, nullable = false),
            StructField("detail", StringType, nullable = false))),
          row => Maintenance.run(table(row.getUTF8String(0).toString))
            .map(a => InternalRow(utf8(a.kind), utf8(a.detail)))))
        case "replicate" => Some((
          Seq(in("source", StringType), in("target", StringType)),
          StructType(Seq(StructField("synced_to_version", LongType, nullable = false))),
          row => Seq(InternalRow(graft.cdc.Replicate.syncOnce(
            table(row.getUTF8String(0).toString),
            table(row.getUTF8String(1).toString))))))
        case "remove_orphan_files" => Some((
          Seq(in("table", StringType), in("older_than", TimestampType)),
          StructType(Seq(StructField("removed", LongType, nullable = false))),
          row => Seq(InternalRow(table(row.getUTF8String(0).toString)
            .removeOrphanFiles(millisOf(row.getLong(1))).toLong))))
        case "publish_branch" => Some((
          Seq(in("table", StringType), in("branch", StringType)),
          StructType(Seq(StructField("published_version", LongType, nullable = false))),
          row => { val t = table(row.getUTF8String(0).toString)
                   t.publishBranch(row.getUTF8String(1).toString)
                   Seq(InternalRow(t.meta.currentVersion)) }))
        case _ => None
      }
    spec.map { case (params, out, run) => new GraftUnboundProcedure(lower, params, out, run) }
  }
}

private final class GraftUnboundProcedure(
    procName: String, params: Seq[ProcedureParameter], out: StructType,
    run: InternalRow => Seq[InternalRow]) extends UnboundProcedure {

  override def name(): String = procName
  override def description(): String = s"graft maintenance procedure $procName"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance procedure $procName"
    override def parameters(): Array[ProcedureParameter] = params.toArray
    // mutates table state — never collapse or reorder invocations
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val result = run(input).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = out
        override def description(): String = s"graft CALL $procName"
      }).iterator()
    }
  }
}
