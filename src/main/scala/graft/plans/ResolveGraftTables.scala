package graft.plans

import graft.tables.ManagedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Analyzer rule giving managed tables a first-class SQL identity:
  * `SELECT * FROM graft.users` resolves to the table's merge-on-read scan
  * against `spark.graft.warehouse` — no view pre-registration, always the
  * current snapshot at query time. This is the Catalyst-native seam the
  * reference's CDI strategy injection maps to (SURVEY §2.8): injected via
  * [[graft.GraftExtensions]], the rule rewrites the unresolved relation
  * into an already-analyzed subplan, so every downstream optimization
  * (pushdown, pruning, AQE) applies as if the user had written the
  * DataFrame directly.
  *
  * Identifier forms (Iceberg metadata-table style):
  *  - `graft.<table>`            — current snapshot
  *  - `graft.<table>$v<N>`       — time travel to version N
  *  - `graft.<table>$files`      — [[ManagedTable.filesMetadata]]
  *  - `graft.<table>$snapshots`  — [[ManagedTable.snapshotsMetadata]]
  *  - `graft.<table>$refs`       — [[ManagedTable.refsMetadata]]
  *  - `graft.<table>$changes`    — full changelog (seq + tombstone cols)
  *
  * Unknown tables fall through unresolved so Spark's normal error (and
  * temp-view/catalog resolution for other names) is preserved.
  */
class ResolveGraftTables(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        u.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      resolve(u.multipartIdentifier(1)).getOrElse(u)
  }

  private def resolve(ident: String): Option[LogicalPlan] = {
    val wh = session.conf.getOption("spark.graft.warehouse")
    if (wh.isEmpty) return None
    val (name, suffix) = ident.indexOf('$') match {
      case -1 => (ident, None)
      case i  => (ident.take(i), Some(ident.drop(i + 1)))
    }
    ManagedTable.load(session, wh.get, name).flatMap { t =>
      val df = suffix match {
        case None              => Some(t.read())
        case Some("files")     => Some(t.filesMetadata())
        case Some("snapshots") => Some(t.snapshotsMetadata())
        case Some("refs")      => Some(t.refsMetadata())
        case Some("changes")   => Some(t.readChangesBetween(0L, t.meta.currentVersion))
        case Some(v) if v.length > 1 && v.length <= 18 &&
            v.startsWith("v") && v.drop(1).forall(_.isDigit) =>
          // non-empty + length-bounded digits keep toLong total; a
          // RETAINED-version miss still raises readVersion's informative
          // error, while malformed suffixes fall through to Spark's
          // normal unresolved-relation error
          Some(t.readVersion(v.drop(1).toLong))
        case _ => None
      }
      df.map(_.queryExecution.analyzed)
    }
  }
}
