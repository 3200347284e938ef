package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** Persisted SQL view definitions for the `graft` namespace — the
  * composability tool next to CTAS/DML/time travel: `CREATE VIEW graft.v
  * AS <graft SQL>` stores the body's ORIGINAL SQL TEXT (never a plan —
  * the view re-resolves against the current table state at every
  * reference, standard SQL view semantics) in warehouse-adjacent
  * metadata at `<warehouse>/_views/<name>.sql`, where it is visible to
  * every session sharing the warehouse. TEMP views stay entirely on
  * Spark's session-local machinery (a temp view body naturally resolves
  * graft relations through the extension rules), so only persisted views
  * live here. Storage is one tiny file per view — metadata-scale at any
  * table size.
  *
  * Name-collision guards with tables are check-then-act: two SESSIONS
  * racing `CREATE TABLE graft.x` against `CREATE VIEW graft.x` can both
  * land (the atomic create here only serializes view-vs-view). The
  * outcome is deterministic, not corrupt — resolution always prefers the
  * managed table, and `DROP VIEW` still reaches the shadowed definition —
  * matching the usual lakehouse stance that DDL on one name is
  * coordinated above the storage layer.
  */
object ViewStore {

  /** Same identifier shape table names use; also keeps the path safe. */
  def validName(name: String): Boolean = name.matches("[A-Za-z_][A-Za-z0-9_]*")

  private def file(wh: String, name: String) = new Path(wh, s"_views/$name.sql")

  private def fsOf(session: SparkSession, wh: String) =
    TableMeta.fs(session.sparkContext.hadoopConfiguration, wh)

  /** Store `sql` as the definition of view `name`. `replace` overwrites;
    * otherwise an existing definition fails (CREATE VIEW semantics — the
    * IF NOT EXISTS / OR REPLACE decision is the caller's).
    */
  def create(session: SparkSession, wh: String, name: String, sql: String,
             replace: Boolean): Unit = {
    require(validName(name), s"invalid view name: $name")
    val fs = fsOf(session, wh)
    val p = file(wh, name)
    fs.mkdirs(p.getParent)
    // create-exclusive unless replacing: two concurrent CREATEs race on
    // the filesystem's atomic create, not on a read-then-write
    val out = fs.create(p, replace)
    try out.write(sql.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def load(session: SparkSession, wh: String, name: String): Option[String] = {
    if (!validName(name)) return None
    val fs = fsOf(session, wh)
    val p = file(wh, name)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val bytes = org.apache.commons.io.IOUtils.toByteArray(in)
        Some(new String(bytes, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Presence probe for guards that only need a boolean — one fs.exists,
    * never a body read (CREATE TABLE collision checks and the DML
    * refusal run on analyzer fixed-point iterations).
    */
  def exists(session: SparkSession, wh: String, name: String): Boolean =
    validName(name) && fsOf(session, wh).exists(file(wh, name))

  /** Remove the definition; true when something was dropped. The name
    * guard is load-bearing here too: a backticked traversal name
    * (`../x`) must not resolve a delete outside `_views/`.
    */
  def drop(session: SparkSession, wh: String, name: String): Boolean = {
    require(validName(name), s"invalid view name: $name")
    val fs = fsOf(session, wh)
    fs.delete(file(wh, name), false)
  }

  def list(session: SparkSession, wh: String): Seq[String] = {
    val fs = fsOf(session, wh)
    val dir = new Path(wh, "_views")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".sql")).map(_.stripSuffix(".sql")).sorted
  }
}
