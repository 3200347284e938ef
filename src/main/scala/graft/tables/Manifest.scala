package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import scala.jdk.CollectionConverters._

/** Per-column min/max of one file group, used for scan pruning (the graft
  * analogue of Iceberg's manifest-entry column bounds). `t` tags the
  * comparison domain: "i" integral, "f" floating, "s" string. Values are
  * stored in their JSON-native form; comparison happens in the tagged
  * domain, so pruning never mixes lexicographic and numeric order.
  *
  * `nulls` is the group's null count for the column (-1 on pre-upgrade
  * manifests = unknown; Iceberg's `null_value_counts` analogue). min/max
  * describe only the NON-null values, so null-aware consumers — top-N
  * truncation's null-ordering accounting, CBO column statistics — need
  * the count alongside the bounds.
  *
  * `ndv` is the group's approximate distinct-value count (-1 unknown),
  * collected by `approx_count_distinct` in the same write-side stats
  * aggregation — the piece Spark's filter/join selectivity estimation
  * cannot work without (the analogue of Iceberg's puffin theta-sketch
  * NDV stats). Cross-group rollups sum the per-group counts capped at
  * the non-null row total: an upper bound, which is what an estimator
  * wants.
  */
final case class ColBounds(t: String, min: Any, max: Any, nulls: Long = -1L,
                           ndv: Long = -1L) {
  /** Does [lo, hi] (inclusive) intersect this group's [min, max]? Unknown
    * domains or incomparable requests answer true (never prune on doubt).
    *
    * String comparison uses UTF-8 BYTE order, not Java's UTF-16 `compareTo`:
    * Spark's min/max (and `between`) order UTF8Strings by unsigned bytes,
    * and the two orders disagree for code points in [U+E000, U+FFFF] vs
    * supplementary-plane characters — a UTF-16 compare here could prune a
    * group that actually holds in-range rows.
    */
  def intersects(lo: Any, hi: Any): Boolean = {
    def num(v: Any): Option[Double] = v match {
      case n: java.lang.Number => Some(n.doubleValue())
      case _                   => None
    }
    def utf8Cmp(a: String, b: String): Int =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    t match {
      case "i" | "f" =>
        (for (l <- num(lo); h <- num(hi); mn <- num(min); mx <- num(max))
          yield h >= mn && l <= mx).getOrElse(true)
      case "s" =>
        (lo, hi, min, max) match {
          case (l: String, h: String, mn: String, mx: String) =>
            utf8Cmp(h, mn) >= 0 && utf8Cmp(l, mx) <= 0
          case _ => true
        }
      case _ => true
    }
  }
}

/** One committed file group of a table snapshot: a directory of immutable
  * data files, stamped with the commit sequence number. The graft analogue
  * of an Iceberg manifest entry with sequence-number-scoped equality
  * deletes (cf. the reference's RowDelta commits,
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
  * `path` is relative to the table directory. `stats` are optional
  * identifier-column bounds (absent on pre-stats manifests and non-stats
  * types — readers treat absence as "cannot prune").
  *
  * `partition` is the group's partition tuple in canonical string form
  * (empty for unpartitioned tables; null values are recorded as the Hive
  * default-partition sentinel). All rows of a group share one tuple — the
  * Iceberg model, where partition pruning is a planning-time manifest
  * filter, not a directory listing, and equality-delete scopes are
  * partition-local (reference partition-granularity delta files,
  * SINK/tableoperator/PartitionedDeltaWriter.java:19-78).
  */
/** A per-column Bloom filter over one file group's values — equality
  * pruning for columns with no sort order (manifest bounds cannot help
  * an unsorted column; a Bloom answers "definitely not in this group"
  * regardless of layout). `m` bits, `k` hash probes, bitset base64-coded.
  * The hash is Spark's xxHash64 seeded per probe index, so the write-side
  * column scan and the driver-side probe agree bit-for-bit.
  */
final case class BloomMeta(m: Int, k: Int, bits: String) {
  private lazy val words: Array[Long] = {
    val raw = java.util.Base64.getDecoder.decode(bits)
    val buf = java.nio.ByteBuffer.wrap(raw)
    Array.fill(raw.length / 8)(buf.getLong)
  }
  /** Might the group contain a value hashing to these probe positions? */
  def mightContain(positions: Seq[Int]): Boolean = positions.forall { p =>
    (words(p >>> 6) & (1L << (p & 63))) != 0L
  }
}

/** One physical file of a committed group — name relative to the group
  * dir + exact byte length, recorded AT COMMIT TIME (the writer just
  * produced the files, so the one listing happens where the data already
  * is). Scan planning then builds its splits from the manifest alone:
  * zero filesystem listing RPCs per plan — the difference between a
  * metadata read and O(live groups) object-store LIST calls at 100 TB,
  * re-paid on every runtime-filter re-plan (Iceberg's manifests carry
  * `file_size_in_bytes` for exactly this reason). Absent on pre-upgrade
  * manifests — readers fall back to listing those groups.
  */
final case class GroupFile(name: String, bytes: Long)

final case class ManifestEntry(path: String, kind: String, seq: Long,
                               stats: Map[String, ColBounds] = Map.empty,
                               partition: Map[String, String] = Map.empty,
                               rows: Long = -1L,
                               blooms: Map[String, BloomMeta] = Map.empty,
                               files: Seq[GroupFile] = Seq.empty)

object Manifest {
  private val mapper = new ObjectMapper()

  val Data = "data"
  val Upsert = "upsert"

  /** Positional-delete sidecar: `(file, pos)` pairs naming rows hidden by
    * every equality-delete scope at or below the entry's `seq`
    * (`appliedUpTo`). Readers anti-join the sidecar instead of re-deriving
    * those scopes — the graft analogue of Iceberg's deletion vectors /
    * rewritten position deletes (reference default on format v3,
    * SINK/tableoperator/IcebergTableWriterFactory.java:98-99).
    */
  val PosDel = "posdel"

  def toJson(entries: Seq[ManifestEntry]): String = toJson(entries, None)

  def toJson(entries: Seq[ManifestEntry], commitTimeMs: Option[Long]): String = {
    val root = mapper.createObjectNode()
    commitTimeMs.foreach(root.put("commitTimeMs", _))
    val arr = root.putArray("entries")
    entries.foreach { e =>
      val n = arr.addObject()
      n.put("path", e.path); n.put("kind", e.kind); n.put("seq", e.seq)
      if (e.rows >= 0L) n.put("rows", e.rows)
      if (e.partition.nonEmpty) {
        val p = n.putObject("partition")
        e.partition.foreach { case (k, v) => p.put(k, v) }
      }
      if (e.files.nonEmpty) {
        val fl = n.putArray("files")
        e.files.foreach { f =>
          val o = fl.addObject()
          o.put("n", f.name); o.put("b", f.bytes)
        }
      }
      if (e.blooms.nonEmpty) {
        val bl = n.putObject("blooms")
        e.blooms.foreach { case (c, b) =>
          val o = bl.putObject(c)
          o.put("m", b.m); o.put("k", b.k); o.put("bits", b.bits)
        }
      }
      if (e.stats.nonEmpty) {
        val st = n.putObject("stats")
        e.stats.foreach { case (c, b) =>
          val o = st.putObject(c)
          o.put("t", b.t)
          if (b.nulls >= 0L) o.put("nulls", b.nulls)
          if (b.ndv >= 0L) o.put("ndv", b.ndv)
          def put(field: String, v: Any): Unit = v match {
            case x: java.lang.Long    => o.put(field, x.longValue())
            case x: java.lang.Integer => o.put(field, x.longValue())
            case x: java.lang.Short   => o.put(field, x.longValue())
            case x: java.lang.Byte    => o.put(field, x.longValue())
            case x: java.lang.Double  => o.put(field, x.doubleValue())
            case x: java.lang.Float   => o.put(field, x.doubleValue())
            case x: String            => o.put(field, x)
            case other                => o.put(field, String.valueOf(other))
          }
          put("min", b.min); put("max", b.max)
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): Seq[ManifestEntry] =
    mapper.readTree(json).get("entries").elements().asScala.map { n =>
      val stats = Option(n.get("stats")).map { st =>
        st.fields().asScala.map { e =>
          val o = e.getValue
          val t = o.get("t").asText
          def v(f: String): Any = t match {
            case "i" => java.lang.Long.valueOf(o.get(f).asLong)
            case "f" => java.lang.Double.valueOf(o.get(f).asDouble)
            case _   => o.get(f).asText
          }
          e.getKey -> ColBounds(t, v("min"), v("max"),
            Option(o.get("nulls")).map(_.asLong).getOrElse(-1L),
            Option(o.get("ndv")).map(_.asLong).getOrElse(-1L))
        }.toMap
      }.getOrElse(Map.empty[String, ColBounds])
      val partition = Option(n.get("partition")).map { p =>
        p.fields().asScala.map(e => e.getKey -> e.getValue.asText).toMap
      }.getOrElse(Map.empty[String, String])
      val blooms = Option(n.get("blooms")).map { bl =>
        bl.fields().asScala.map { e =>
          val o = e.getValue
          e.getKey -> BloomMeta(o.get("m").asInt, o.get("k").asInt,
            o.get("bits").asText)
        }.toMap
      }.getOrElse(Map.empty[String, BloomMeta])
      val files = Option(n.get("files")).map { fl =>
        fl.elements().asScala.map(o =>
          GroupFile(o.get("n").asText, o.get("b").asLong)).toSeq
      }.getOrElse(Seq.empty)
      ManifestEntry(n.get("path").asText, n.get("kind").asText, n.get("seq").asLong,
        stats, partition,
        Option(n.get("rows")).map(_.asLong).getOrElse(-1L),
        blooms, files)
    }.toSeq

  /** Manifests are immutable once written: temp + rename, never rewritten. */
  def write(fs: FileSystem, path: Path, entries: Seq[ManifestEntry]): Unit =
    write(fs, path, entries, None)

  def write(fs: FileSystem, path: Path, entries: Seq[ManifestEntry],
            commitTimeMs: Option[Long]): Unit = {
    fs.mkdirs(path.getParent)
    val tmp = new Path(path.getParent, s".${path.getName}.tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(toJson(entries, commitTimeMs).getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"failed to write manifest $path")
  }

  /** Commit wall-clock of a manifest: the recorded header, or the file's
    * modification time for manifests written before the header existed.
    */
  def commitTimeMs(fs: FileSystem, path: Path): Option[Long] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Option(mapper.readTree(json).get("commitTimeMs")).map(_.asLong)
        .orElse(Some(fs.getFileStatus(path).getModificationTime))
    }

  def read(fs: FileSystem, path: Path): Option[Seq[ManifestEntry]] =
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(fromJson(new String(in.readAllBytes(), "UTF-8"))) finally in.close()
    }
}
