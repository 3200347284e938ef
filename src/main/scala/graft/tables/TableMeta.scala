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
    currentVersion: Long,
    /** Bumped on EVERY meta write, including metadata-only commits (tags,
      * properties, schema evolution) that leave `currentVersion` alone —
      * the optimistic-concurrency check compares both, so a stale handle's
      * data commit cannot silently erase a concurrent metadata commit
      * (e.g. clobber a tag and then GC the snapshot it pinned).
      */
    metaGen: Long = 0L
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
    root.put("metaGen", m.metaGen)
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
      currentVersion = n.get("currentVersion").asLong,
      metaGen = Option(n.get("metaGen")).map(_.asLong).getOrElse(0L)
    )
  }

  /** Atomic pointer write. On LOCAL filesystems: one POSIX `rename(2)`
    * over the live file (`ATOMIC_MOVE + REPLACE_EXISTING`) — a concurrent
    * reader sees the old pointer or the new one, NEVER a missing file
    * (round 9: the rename-aside dance below has a window between
    * rename-aside and rename-in where a changelog source polling a table
    * under active commits observed "table vanished" — measured in a
    * 360-commit follow soak). On DFS implementations whose rename cannot
    * replace (HDFS contract): temp + rename-aside + rename-in, like a
    * catalog pointer swap — the live pointer is never deleted before its
    * replacement is in place, a crash at any point leaves either the old
    * or the new pointer recoverable ([[read]] restores
    * `.meta.json.__old` when `meta.json` is missing, and retries briefly
    * to ride out a concurrent writer's in-flight swap).
    */
  def write(fs: FileSystem, tableDir: Path, m: TableMeta): Unit = {
    val dst = new Path(tableDir, "meta.json")
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        // Pure NIO on the local path — writing the temp through the
        // Hadoop fs would leave a ChecksumFileSystem '..tmp....crc'
        // sidecar orphaned by the NIO move (one per write, forever), and
        // any '.meta.json.crc' from the pre-round-9 rename path would go
        // STALE against the moved-in bytes, failing every subsequent
        // checksummed read. Drop the legacy crc BEFORE the move (a reader
        // in between reads the old pointer uncheckummed — fine), then one
        // atomic rename(2): readers see the old or new pointer, never
        // neither.
        val dir = java.nio.file.Paths.get(tableDir.toUri.getPath)
        java.nio.file.Files.createDirectories(dir)
        val tmp = java.nio.file.Files.createTempFile(dir, ".meta.json.tmp-", "")
        java.nio.file.Files.write(tmp, toJson(m).getBytes("UTF-8"))
        java.nio.file.Files.deleteIfExists(dir.resolve(".meta.json.crc"))
        java.nio.file.Files.move(tmp, dir.resolve("meta.json"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      case _ =>
        val tmp = new Path(tableDir, s".meta.json.tmp-${System.nanoTime()}")
        val out = fs.create(tmp, true)
        try out.write(toJson(m).getBytes("UTF-8")) finally out.close()
        val old = new Path(tableDir, ".meta.json.__old")
        fs.delete(old, false) // leftover from an earlier completed swap
        if (fs.exists(dst) && !fs.rename(dst, old))
          throw new java.io.IOException(s"failed to stage metadata swap for ${m.name}")
        if (!fs.rename(tmp, dst)) {
          fs.rename(old, dst) // best-effort rollback to the previous pointer
          throw new java.io.IOException(s"failed to commit metadata for ${m.name}")
        }
        fs.delete(old, false)
    }
  }

  def read(fs: FileSystem, tableDir: Path): Option[TableMeta] = {
    val p = new Path(tableDir, "meta.json")
    val old = new Path(tableDir, ".meta.json.__old")
    // Local FS writes are one atomic rename — a missing pointer there is
    // a genuinely absent table, answered immediately (load-miss sits on
    // the hot analysis path: view resolution, IF NOT EXISTS probes). The
    // non-local swap path has a window between its two renames, so a
    // missing pointer EITHER means absent, a writer crashed mid-swap
    // (restore the aside copy), or a concurrent writer mid-swap — retry
    // briefly (3 × 10 ms) before concluding absence.
    val atomicLocal = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    var attempts = if (atomicLocal) 2 else 0
    while (!fs.exists(p) && attempts < 3) {
      if (fs.exists(old)) { fs.rename(old, p); attempts = 3 }
      else { attempts += 1; if (attempts < 3) Thread.sleep(10) }
    }
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(fromJson(new String(in.readAllBytes(), "UTF-8"))) finally in.close()
    }
  }

  def fs(conf: Configuration, path: String): FileSystem =
    new Path(path).getFileSystem(conf)
}
