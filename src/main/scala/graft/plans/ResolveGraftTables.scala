package graft.plans

import graft.tables.ManagedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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

  // top-down: the Filter case must see its still-unresolved child before
  // the bare-relation case rewrites it
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    // `WHERE c = <lit>` directly over a graft relation: resolve to the
    // MANIFEST-PRUNED scan (column bounds + Bloom filters,
    // [[ManagedTable.readWhereEq]]) instead of the full scan — the filter
    // is kept on top (pruning opens a superset of the matching groups),
    // so semantics are identical and the win is groups never opened. The
    // planning-time analogue of parquet row-group bloom pruning, one
    // level up.
    case f @ Filter(cond, u: UnresolvedRelation) if isGraft(u) &&
        !u.multipartIdentifier(1).contains('$') =>
      resolvePruned(u.multipartIdentifier(1), cond)
        .orElse(resolve(u.multipartIdentifier(1)))
        .map(child => Filter(cond, child)).getOrElse(f)
    case u: UnresolvedRelation if isGraft(u) =>
      resolve(u.multipartIdentifier(1)).getOrElse(u)
  }

  private def isGraft(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The pruned scan for the first prunable conjunct: a RANGE (or
    * equality) on a monotone partition source column tuple-prunes via
    * [[ManagedTable.readSourceRange]]; otherwise a `col = literal`
    * conjunct group-prunes via bounds + Bloom ([[ManagedTable
    * .readWhereEq]]). The caller keeps the original filter on top, so
    * pruning only ever opens a superset of the matching groups.
    */
  private def resolvePruned(name: String, cond: Expression): Option[LogicalPlan] = {
    val wh = session.conf.getOption("spark.graft.warehouse")
    if (wh.isEmpty) return None
    ManagedTable.load(session, wh.get, name).flatMap { t =>
      // (column, isLower, inclusive?, literal) per range conjunct;
      // equality contributes both bounds
      val ranges = conjuncts(cond).flatMap {
        case EqualTo(a: UnresolvedAttribute, l: Literal) if l.value != null =>
          Seq((a.nameParts.last, true, l), (a.nameParts.last, false, l))
        case EqualTo(l: Literal, a: UnresolvedAttribute) if l.value != null =>
          Seq((a.nameParts.last, true, l), (a.nameParts.last, false, l))
        case GreaterThanOrEqual(a: UnresolvedAttribute, l: Literal) if l.value != null =>
          Seq((a.nameParts.last, true, l))
        case GreaterThan(a: UnresolvedAttribute, l: Literal) if l.value != null =>
          Seq((a.nameParts.last, true, l))
        case LessThanOrEqual(a: UnresolvedAttribute, l: Literal) if l.value != null =>
          Seq((a.nameParts.last, false, l))
        case LessThan(a: UnresolvedAttribute, l: Literal) if l.value != null =>
          Seq((a.nameParts.last, false, l))
        case GreaterThanOrEqual(l: Literal, a: UnresolvedAttribute) if l.value != null =>
          Seq((a.nameParts.last, false, l))
        case GreaterThan(l: Literal, a: UnresolvedAttribute) if l.value != null =>
          Seq((a.nameParts.last, false, l))
        case LessThanOrEqual(l: Literal, a: UnresolvedAttribute) if l.value != null =>
          Seq((a.nameParts.last, true, l))
        case LessThan(l: Literal, a: UnresolvedAttribute) if l.value != null =>
          Seq((a.nameParts.last, true, l))
        case _ => Seq.empty
      }
      // Pruning rewrites the comparison into the COLUMN's domain, which
      // is only Spark-equivalent when Spark itself would compare there.
      // A numeric literal against a STRING column coerces the COLUMN
      // (s = 5 matches "05"); pruning on the string "5" would drop "05".
      // So: same type, string=string, or integral literal into an
      // integral column with exact value round-trip. Everything else
      // falls back to the unpruned scan.
      import org.apache.spark.sql.types._
      def comparableInColumnDomain(fld: StructField, l: Literal): Boolean = {
        def integral(dt: DataType) = dt match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        fld.dataType == l.dataType ||
          (integral(fld.dataType) && integral(l.dataType))
      }
      def extValue(fld: StructField, l: Literal): Option[Any] = {
        if (!comparableInColumnDomain(fld, l)) return None
        val casted = try Cast(l, fld.dataType, Some(conf.sessionLocalTimeZone))
          .eval(null) catch { case _: Exception => null }
        // integral narrowing must round-trip exactly (1e10 into an INT
        // column must not prune on the truncated value)
        val roundTrips = casted != null && (fld.dataType == l.dataType || {
          val back = try Cast(Literal.create(casted, fld.dataType), l.dataType,
            Some(conf.sessionLocalTimeZone)).eval(null) catch { case _: Exception => null }
          back == l.value
        })
        if (!roundTrips) None
        else Some(CatalystTypeConverters.convertToScala(casted, fld.dataType))
      }
      def logical(df: org.apache.spark.sql.DataFrame): LogicalPlan =
        df.select(t.meta.schema.fieldNames.toIndexedSeq.map(
          org.apache.spark.sql.functions.col): _*).queryExecution.analyzed
      // 1. partition-source tuple pruning — the strongest cut at scale
      val partitionPruned = ranges.groupBy(_._1).view
        .flatMap { case (colName, bs) =>
          t.meta.schema.fields.find(_.name.equalsIgnoreCase(colName))
            .filter(f => t.isMonotonePartitionSource(f.name))
            .flatMap { fld =>
              val lo = bs.collectFirst { case (_, true, l) => l }
                .flatMap(extValue(fld, _))
              val hi = bs.collectFirst { case (_, false, l) => l }
                .flatMap(extValue(fld, _))
              if (lo.isEmpty && hi.isEmpty) None
              else Some(logical(t.readSourceRange(fld.name, lo, hi)))
            }
        }.headOption
      if (partitionPruned.isDefined) return partitionPruned
      // 2. bounds + Bloom group pruning on an equality conjunct
      val eq = conjuncts(cond).collectFirst(Function.unlift {
        case EqualTo(a: UnresolvedAttribute, l: Literal) if l.value != null =>
          Some((a.nameParts.last, l))
        case EqualTo(l: Literal, a: UnresolvedAttribute) if l.value != null =>
          Some((a.nameParts.last, l))
        case _ => None
      })
      eq.flatMap { case (colName, l) =>
        t.meta.schema.fields.find(_.name.equalsIgnoreCase(colName)).flatMap { fld =>
          extValue(fld, l).map { ext =>
            logical(t.readWhereEq(fld.name, ext))
          }
        }
      }
    }
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
