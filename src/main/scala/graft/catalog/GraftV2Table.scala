package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.tables.ManagedTable

/** A graft table through the DSv2 seam — batch reads only; every write
  * verb lives on the `graft.` SQL surface and the [[ManagedTable]] API
  * (one commit protocol, not two). The table handle pins the snapshot
  * loaded at resolution time, so one query reads one version.
  *
  * `pinnedRef` carries V2 time travel (`VERSION AS OF` → snapshot number
  * / tag / branch via [[GraftCatalog.loadTable]]) and the wap-branch
  * routing: the scan plans from that ref's entry set instead of the
  * live snapshot.
  */
final class GraftV2Table(val t: ManagedTable,
                         val pinnedRef: Option[String] = None)
    extends Table with SupportsRead {

  override def name(): String = t.name

  override def schema(): StructType = t.meta.schema

  override def partitioning(): Array[Transform] =
    t.v2PartitionFields.map(GraftCatalog.specToTransform(_, t.meta.partitionBy)).toArray

  override def properties(): util.Map[String, String] = t.meta.properties.asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(t, pinnedRef)
}
