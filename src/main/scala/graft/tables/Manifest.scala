package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.jdk.CollectionConverters._

/** One committed file group of an unpartitioned table snapshot: a directory
  * of immutable data files, stamped with the commit sequence number. The
  * graft analogue of an Iceberg manifest entry with sequence-number-scoped
  * equality deletes (cf. the reference's RowDelta commits,
  * SINK/tableoperator/IcebergTableOperator.java:205-249, and its
  * equality-delta writers, SINK/tableoperator/BaseDeltaTaskWriter.java:52-72):
  *
  *  - `kind=data` — plain rows (append / overwrite / compaction output);
  *    asserts nothing about other groups.
  *  - `kind=upsert` — a merge commit's per-key winners. The group doubles
  *    as its own equality-delete file: its (identifier, seq) pairs hide
  *    rows of any group with a strictly smaller seq, so an upsert batch is
  *    ONE written file group, not a data + delete pair. Hard deletes ride
  *    along as tombstone rows (filtered out by readers, dropped by
  *    compaction).
  *
  * `path` is relative to the table directory.
  */
final case class ManifestEntry(path: String, kind: String, seq: Long)

object Manifest {
  private val mapper = new ObjectMapper()

  val Data = "data"
  val Upsert = "upsert"

  def toJson(entries: Seq[ManifestEntry]): String = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("entries")
    entries.foreach { e =>
      val n = arr.addObject()
      n.put("path", e.path); n.put("kind", e.kind); n.put("seq", e.seq)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): Seq[ManifestEntry] =
    mapper.readTree(json).get("entries").elements().asScala.map { n =>
      ManifestEntry(n.get("path").asText, n.get("kind").asText, n.get("seq").asLong)
    }.toSeq

  /** Manifests are immutable once written: temp + rename, never rewritten. */
  def write(fs: FileSystem, path: Path, entries: Seq[ManifestEntry]): Unit = {
    fs.mkdirs(path.getParent)
    val tmp = new Path(path.getParent, s".${path.getName}.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(toJson(entries).getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"failed to write manifest $path")
  }

  def read(fs: FileSystem, path: Path): Option[Seq[ManifestEntry]] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(fromJson(new String(in.readAllBytes(), "UTF-8"))) finally in.close()
    }
}
