package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables.ManagedTable

/** A graft table through the DSv2 seam. Reads plan partition-aware MoR
  * scans ([[GraftScan]]); writes bridge through [[V1Write]] to the SAME
  * [[ManagedTable]] commit protocol the SQL surface and the V1 seam use
  * — one write path, three spellings. The table handle pins the snapshot
  * loaded at resolution time, so one query reads one version.
  *
  * `pinnedRef` carries V2 time travel (`VERSION AS OF` → snapshot number
  * / tag / branch via [[GraftCatalog.loadTable]]) and the wap-branch
  * routing: the scan plans from that ref's entry set instead of the
  * live snapshot. Writes against an explicitly pinned ref refuse; under
  * an ambient `spark.wap.branch` they STAGE onto the branch like the SQL
  * surface's INSERT.
  */
final class GraftV2Table(val t: ManagedTable,
                         val pinnedRef: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = t.name

  override def schema(): StructType = t.meta.schema

  override def partitioning(): Array[Transform] =
    t.v2PartitionFields.map(GraftCatalog.specToTransform(_, t.meta.partitionBy)).toArray

  override def properties(): util.Map[String, String] = t.meta.properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(t, pinnedRef)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    def wapBranch: Option[String] = SparkSession.active.conf
      .getOption("spark.wap.branch").filter(_.nonEmpty)
    require(pinnedRef.isEmpty || pinnedRef == wapBranch,
      s"graft V2 catalog: cannot write to ${t.name} VERSION AS OF " +
        s"'${pinnedRef.get}' — time-traveled tables are read-only " +
        "(rollback via CALL graft.system.rollback_to_version)")
    new GraftWriteBuilder(t)
  }
}

/** INSERT INTO → append (or branch staging under `spark.wap.branch`);
  * INSERT OVERWRITE → whole-table overwrite (V2 truncate semantics) —
  * reached through [[InsertableRelation]] so the write is ONE
  * [[ManagedTable]] commit.
  *
  * Deliberately NOT declared: `OVERWRITE_DYNAMIC` and overwrite-by-filter
  * — both execs require a connector-native `BatchWrite` (no V1 bridge
  * exists), which would mean a SECOND write protocol. Under
  * `partitionOverwriteMode=dynamic` or a static PARTITION spec, Spark
  * refuses with its capability error naming the table — the graft SQL
  * surface (`INSERT OVERWRITE graft.<t> …`) is the full-featured
  * overwrite path (dynamic tuples, static regions, keyed region drops).
  */
final class GraftWriteBuilder(t: ManagedTable)
    extends WriteBuilder with SupportsTruncate {

  private var overwriteAll = false

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation(): InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        val session = data.sparkSession
        val over = overwriteAll || overwrite
        // NOT gated on the branch existing: writes auto-create it, like
        // the SQL surface (reads are the side that falls back to live)
        val wap = session.conf.getOption("spark.wap.branch").filter(_.nonEmpty)
        require(wap.isEmpty || !over,
          s"INSERT OVERWRITE ${t.name} cannot target WAP branch " +
            s"'${wap.get}' — branches stage appends and row-level DML, " +
            "not overwrites (unset spark.wap.branch to overwrite the live table)")
        if (over) t.overwrite(data)
        else wap match {
          case Some(br) => t.stageAppendInto(data, br)
          case None     => t.append(data)
        }
      }
    }
  }
}
