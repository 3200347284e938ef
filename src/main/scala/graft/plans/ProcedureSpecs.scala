package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, LongType, StringType, TimestampType}

import graft.tables.{Maintenance, ManagedTable}

/** THE stored-procedure spec — one declaration of the nine maintenance
  * verbs (names, parameter order/types, result schemas, and the
  * ManagedTable dispatch bodies), rendered by BOTH seams:
  * `CALL graft.system.<proc>` at the SQL parser seam
  * ([[ResolveGraftDdl]]) and `CALL <cat>.system.<proc>` through Spark's
  * native V2 ProcedureCatalog ([[graft.catalog.GraftProcedures]]).
  * Adding a verb or changing a result column here changes both seams
  * together — they can never drift.
  *
  * Conventions at the `run` boundary: arguments arrive as Scala values in
  * declared order — `StringType` → String, `LongType`/`TimestampType` →
  * Long (timestamps as epoch MILLIS; each seam converts its literal
  * spelling). Results are rows of Scala values (String/Long) matching
  * `out`.
  */
object ProcedureSpecs {

  final case class Spec(
      name: String,
      params: Seq[(String, DataType)],
      out: Seq[(String, DataType)],
      /** Which argument names the table in progress displays. */
      displayArg: Int,
      run: (SparkSession, String => ManagedTable, Seq[Any]) => Seq[Seq[Any]])

  private def str(a: Seq[Any], i: Int): String = a(i).asInstanceOf[String]
  private def lng(a: Seq[Any], i: Int): Long = a(i).asInstanceOf[Long]

  val all: Seq[Spec] = Seq(
    Spec("compact", Seq("table" -> StringType),
      Seq("files_before" -> LongType, "files_after" -> LongType), 0,
      (_, load, a) => { val (b, x) = load(str(a, 0)).compact(); Seq(Seq(b, x)) }),
    Spec("compact_minor", Seq("table" -> StringType),
      Seq("trickle_groups_before" -> LongType, "trickle_groups_after" -> LongType), 0,
      (_, load, a) => { val (b, x) = load(str(a, 0)).compactMinor()
                        Seq(Seq(b.toLong, x.toLong)) }),
    Spec("materialize_position_deletes", Seq("table" -> StringType),
      Seq("pairs" -> LongType), 0,
      (_, load, a) => Seq(Seq(load(str(a, 0)).materializePositionalDeletes()))),
    Spec("expire_snapshots", Seq("table" -> StringType, "older_than" -> TimestampType),
      Seq("expired" -> LongType), 0,
      (_, load, a) => Seq(Seq(load(str(a, 0)).expireSnapshots(lng(a, 1)).toLong))),
    Spec("rollback_to_version", Seq("table" -> StringType, "version" -> LongType),
      Seq("current_version" -> LongType), 0,
      (_, load, a) => { val t = load(str(a, 0)); t.rollbackTo(lng(a, 1))
                        Seq(Seq(t.meta.currentVersion)) }),
    Spec("maintenance", Seq("table" -> StringType),
      Seq("action" -> StringType, "detail" -> StringType), 0,
      (_, load, a) => Maintenance.run(load(str(a, 0))).map(x => Seq(x.kind, x.detail))),
    Spec("replicate", Seq("source" -> StringType, "target" -> StringType),
      Seq("synced_to_version" -> LongType), 1,
      (_, load, a) => Seq(Seq(graft.cdc.Replicate.syncOnce(
        load(str(a, 0)), load(str(a, 1)))))),
    Spec("remove_orphan_files", Seq("table" -> StringType, "older_than" -> TimestampType),
      Seq("removed" -> LongType), 0,
      (_, load, a) => Seq(Seq(load(str(a, 0)).removeOrphanFiles(lng(a, 1)).toLong))),
    Spec("publish_branch", Seq("table" -> StringType, "branch" -> StringType),
      Seq("published_version" -> LongType), 0,
      (_, load, a) => { val t = load(str(a, 0)); t.publishBranch(str(a, 1))
                        Seq(Seq(t.meta.currentVersion)) }),
    Spec("analyze", Seq("table" -> StringType, "columns" -> StringType),
      Seq("groups_updated" -> LongType, "columns_analyzed" -> StringType), 0,
      (_, load, a) => {
        val cols = str(a, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val (n, cs) = load(str(a, 0)).analyzeColumns(cols)
        Seq(Seq(n, cs.mkString(",")))
      }))

  val byName: Map[String, Spec] = all.map(s => s.name -> s).toMap

  def names: Seq[String] = all.map(_.name)
}
