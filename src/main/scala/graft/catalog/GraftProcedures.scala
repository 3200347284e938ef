package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.ProcedureSpecs
import graft.tables.ManagedTable

/** `CALL <cat>.system.<proc>(…)` through Spark's NATIVE stored-procedure
  * resolution (the V2 `ProcedureCatalog` API, Spark 4) — rendered from
  * [[ProcedureSpecs]], the SAME single declaration the graft SQL surface
  * renders at its parser seam, so the two seams can never drift. Spark
  * owns the grammar, argument coercion, and named-argument resolution
  * here; results come back as driver-local scans of informational rows,
  * exactly like the SQL surface's eager commands (and Iceberg's
  * procedures). Every verb is manifest/metadata-scale to PLAN — the
  * heavy ones (compact) run the same distributed rewrite the API runs.
  */
object GraftProcedures {

  val Names: Seq[String] = ProcedureSpecs.names

  def load(spark: SparkSession, warehouse: String, proc: String): Option[UnboundProcedure] = {
    def table(name: String): ManagedTable =
      ManagedTable.load(spark, warehouse, name).getOrElse(
        throw new IllegalArgumentException(s"table '$name' does not exist in $warehouse"))
    ProcedureSpecs.byName.get(proc.toLowerCase(java.util.Locale.ROOT))
      .map(new GraftUnboundProcedure(_, spark, table))
  }
}

private final class GraftUnboundProcedure(
    spec: ProcedureSpecs.Spec, spark: SparkSession,
    table: String => ManagedTable) extends UnboundProcedure {

  override def name(): String = spec.name
  override def description(): String = s"graft maintenance procedure ${spec.name}"

  override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
    override def name(): String = spec.name
    override def description(): String = s"graft maintenance procedure ${spec.name}"
    override def parameters(): Array[ProcedureParameter] =
      spec.params.map { case (n, dt) => ProcedureParameter.in(n, dt).build() }.toArray
    // mutates table state — never collapse or reorder invocations
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      // spec boundary: String / Long, timestamps as epoch MILLIS (the V2
      // TimestampType argument arrives as micros-since-epoch)
      val args: Seq[Any] = spec.params.zipWithIndex.map {
        case ((_, StringType), i)    => input.getUTF8String(i).toString
        case ((_, TimestampType), i) => Math.floorDiv(input.getLong(i), 1000L)
        case ((_, _), i)             => input.getLong(i)
      }
      val out = StructType(spec.out.map { case (n, dt) =>
        StructField(n, dt, nullable = false) })
      val result = spec.run(spark, table, args).map(vals =>
        InternalRow.fromSeq(vals.map {
          case s: String => UTF8String.fromString(s)
          case x => x
        })).toArray
      java.util.List.of[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = result
        override def readSchema(): StructType = out
        override def description(): String = s"graft CALL ${spec.name}"
      }).iterator()
    }
  }
}
