package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Table metadata: the graft analogue of Iceberg table metadata —
  * current schema, identifier fields, partition spec strings, properties
  * and the snapshot-version pointer. Persisted as `<table>/meta.json`;
  * commits flip the pointer only after the new snapshot directory is fully
  * written (mirroring the reference's atomic catalog commits, W6/W7).
  */
final case class TableMeta(
    name: String,
    schema: StructType,
    identifierFields: Seq[String],
    partitionBy: Seq[String],
    properties: Map[String, String],
    currentVersion: Long
)

object TableMeta {
  private val mapper = new ObjectMapper()

  def toJson(m: TableMeta): String = {
    val root = mapper.createObjectNode()
    root.put("name", m.name)
    root.put("schema", m.schema.json)
    val ids = root.putArray("identifierFields"); m.identifierFields.foreach(ids.add)
    val pb = root.putArray("partitionBy"); m.partitionBy.foreach(pb.add)
    val props = root.putObject("properties")
    m.properties.foreach { case (k, v) => props.put(k, v) }
    root.put("currentVersion", m.currentVersion)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): TableMeta = {
    val n = mapper.readTree(json).asInstanceOf[ObjectNode]
    TableMeta(
      name = n.get("name").asText,
      schema = DataType.fromJson(n.get("schema").asText).asInstanceOf[StructType],
      identifierFields = n.get("identifierFields").elements().asScala.map(_.asText).toSeq,
      partitionBy = n.get("partitionBy").elements().asScala.map(_.asText).toSeq,
      properties = Option(n.get("properties"))
        .map(p => p.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
        .getOrElse(Map.empty),
      currentVersion = n.get("currentVersion").asLong
    )
  }

  /** Atomic-ish write: temp file + rename, like a catalog pointer swap. */
  def write(fs: FileSystem, tableDir: Path, m: TableMeta): Unit = {
    val tmp = new Path(tableDir, s".meta.json.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(toJson(m).getBytes("UTF-8")) finally out.close()
    val dst = new Path(tableDir, "meta.json")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"failed to commit metadata for ${m.name}")
  }

  def read(fs: FileSystem, tableDir: Path): Option[TableMeta] = {
    val p = new Path(tableDir, "meta.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(fromJson(new String(in.readAllBytes(), "UTF-8"))) finally in.close()
    }
  }

  def fs(conf: Configuration, path: String): FileSystem =
    new Path(path).getFileSystem(conf)
}
