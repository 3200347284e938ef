package graft.plans

import graft.tables.ManagedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Not, NullsFirst}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, GlobalLimit, InsertIntoStatement, LocalLimit, LogicalPlan, MergeIntoTable, Project, Sort, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.GraftBridge

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
  *  - `graft.<table>$branch_<b>` — WAP branch audit view (round 8); a
  *    set `spark.wap.branch` routes plain reads and INSERTs of tables
  *    carrying that branch the same way
  *
  * Unknown tables fall through unresolved so Spark's normal error (and
  * temp-view/catalog resolution for other names) is preserved.
  */
class ResolveGraftTables(session: SparkSession) extends Rule[LogicalPlan] {

  // top-down: the Filter case must see its still-unresolved child before
  // the bare-relation case rewrites it
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    // ---- SQL DML: the statement nodes Spark's parser produces become
    // eager [[GraftDmlCommand]]s over the ManagedTable row-level DML API
    // (merge-on-read commits — the SQL spellings of deleteWhere /
    // updateWhere / append / mergeInto). Matched BEFORE the relation
    // cases so the target never resolves into a bare scan.
    case d @ DeleteFromTable(GraftMetaTarget(full), _) => readOnly(full, d)
    case u0 @ UpdateTable(GraftMetaTarget(full), _, _) => readOnly(full, u0)
    case i: InsertIntoStatement if GraftMetaTarget.unapply(i.table).isDefined =>
      readOnly(GraftMetaTarget.unapply(i.table).get, i)
    case m: MergeIntoTable if GraftMetaTarget.unapply(m.targetTable).isDefined =>
      readOnly(GraftMetaTarget.unapply(m.targetTable).get, m)
    case d @ DeleteFromTable(GraftTarget(name, alias), cond) =>
      loadTable(name).map { t =>
        val c = stripQualifier(cond, alias)
        // write-audit-publish: with spark.wap.branch naming a live branch
        // of this table, row-level DML STAGES onto the branch (Iceberg's
        // branch-targeted DML, round 9) — the live table is untouched
        // until CALL publish_branch
        GraftDmlCommand("DELETE", name,
          () => wapWriteBranch match {
            case Some(b) => t.deleteWhereOnBranch(GraftBridge.column(c), b)
            case None    => t.deleteWhere(GraftBridge.column(c))
          }): LogicalPlan
      }.getOrElse(refuseIfView(name, "DELETE", d))
    case u0 @ UpdateTable(GraftTarget(name, alias), assigns, cond) =>
      loadTable(name).map { t =>
        val set = assigns.map(a =>
          assignName(a.key) -> GraftBridge.column(stripQualifier(a.value, alias))).toMap
        val c = stripQualifier(cond.getOrElse(Literal.TrueLiteral), alias)
        GraftDmlCommand("UPDATE", name,
          () => wapWriteBranch match {
            case Some(b) => t.updateWhereOnBranch(GraftBridge.column(c), set, b)
            case None    => t.updateWhere(GraftBridge.column(c), set)
          }): LogicalPlan
      }.getOrElse(refuseIfView(name, "UPDATE", u0))
    // INSERT [OVERWRITE] — with an optional `PARTITION (k=v, k2, …)`
    // spec on identity partition sources. STATIC entries (k=v) become
    // literal columns; DYNAMIC entries (bare k) take their values from
    // the query, exactly like omitting them (Spark's equivalence).
    // Positional queries provide the non-static columns in schema order.
    // OVERWRITE with a fully-static spec replaces EXACTLY the named
    // region (stale sibling tuples under extra derived transforms
    // cleared; an empty source truncates — SQL static semantics). With
    // dynamic entries present, partitionOverwriteMode decides, per
    // Spark: static mode clears the whole static-prefix region; dynamic
    // mode replaces only the tuples the batch writes.
    case i: InsertIntoStatement if (i.table match {
        case GraftTarget(_, _) => true
        case _ => false
      }) =>
      val GraftTarget(name, _) = i.table: @unchecked
      loadTable(name).map { t =>
        // spec keys are canonicalized to the schema's field names with the
        // session resolver, so PARTITION (G=7) works (and is refused for
        // overlap) exactly like (g=7) under case-insensitive resolution
        val resolver = session.sessionState.analyzer.resolver
        def schemaName(k: String): String =
          t.meta.schema.fields.find(f => resolver(f.name, k)).getOrElse(
            throw new IllegalArgumentException(
              s"INSERT ... PARTITION graft.$name: unknown column '$k'")).name
        val staticSpec: Seq[(String, String)] = i.partitionSpec.toSeq.collect {
          case (k, Some(v)) => schemaName(k) -> v
        }
        val dynamicKeys: Seq[String] = i.partitionSpec.toSeq.collect {
          case (k, None) => schemaName(k)
        }
        // identity sources come from the real spec parser — the same
        // grammar the write path uses (IDENTITY(g), inner spaces, ...)
        val identitySources = graft.tables.PartitionSpecParser
          .parse(t.meta.partitionBy, t.meta.schema.fieldNames.toSet)
          .filter(_.transform == "identity").map(_.sourceColumn).toSet
        (staticSpec.map(_._1) ++ dynamicKeys).foreach { k =>
          require(identitySources.contains(k),
            s"INSERT ... PARTITION graft.$name: '$k' is not an identity " +
              s"partition source column (spec: ${t.meta.partitionBy.mkString(", ")})")
        }
        val (q, cols, over, byName) =
          (i.query, i.userSpecifiedCols, i.overwrite, i.byName)
        val label = (if (over) "INSERT OVERWRITE" else "INSERT") +
          (if (i.partitionSpec.nonEmpty) " PARTITION" else "")
        GraftDmlCommand(label, name, () => {
          val df0 = GraftBridge.dataFrame(session, q)
          val specCols = staticSpec.map(_._1).toSet
          val expected = t.meta.schema.fields.toSeq.filterNot(f => specCols.contains(f.name))
          def noSpecOverlap(produced: Seq[String]): Unit = {
            val dup = produced.filter(p => specCols.exists(resolver(p, _)))
            require(dup.isEmpty,
              s"INSERT ... PARTITION graft.$name: the query/column list also " +
                s"provides PARTITION column(s) ${dup.mkString(", ")} — their " +
                "per-row values would be silently replaced by the static spec")
          }
          def requireDynamic(produced: Seq[String]): Unit = {
            val missing = dynamicKeys.filterNot(k => produced.exists(resolver(_, k)))
            require(missing.isEmpty,
              s"INSERT ... PARTITION graft.$name: dynamic partition column(s) " +
                s"${missing.mkString(", ")} must be provided by the query")
          }
          val base =
            if (cols.nonEmpty) {
              noSpecOverlap(cols); requireDynamic(cols)
              require(df0.columns.length == cols.length,
                s"INSERT column list has ${cols.length} columns but the query produces ${df0.columns.length}")
              df0.toDF(cols: _*)
            } else if (byName) {
              noSpecOverlap(df0.columns.toSeq); requireDynamic(df0.columns.toSeq)
              df0
            } else {
              require(df0.columns.length == expected.length,
                s"positional INSERT needs ${expected.length} columns " +
                  s"(${expected.map(_.name).mkString(", ")}), query produces ${df0.columns.length}")
              df0.toDF(expected.map(_.name): _*)
            }
          val df = staticSpec.foldLeft(base) { case (d, (k, v)) =>
            d.withColumn(k, lit(v).cast(t.meta.schema(k).dataType))
          }
          def dynamicMode = session.conf
            .get("spark.sql.sources.partitionOverwriteMode", "static")
            .equalsIgnoreCase("dynamic")
          // Spark's rule: partition columns the spec OMITS are dynamic
          // too — the spec is fully static only when it names EVERY
          // identity source. overwriteStaticRegion routes both keyed and
          // keyless tables to the zero-rewrite region drop (keyed since
          // round 8; `delete.keyed-region-mode=tombstone` opts keyed
          // tables back into changelog-precise tombstones).
          val fullyStatic = dynamicKeys.isEmpty &&
            identitySources.subsetOf(staticSpec.map(_._1).toSet)
          // write-audit-publish: with `spark.wap.branch` set, a plain
          // INSERT stages onto that branch instead of committing — the
          // live table is untouched until CALL publish_branch (Iceberg's
          // write-to-branch session conf). Overwrites are refused: a
          // branch stages appends and row-level DML (round 9), not
          // whole-region replacement.
          val wapBranch = session.conf.getOption("spark.wap.branch").filter(_.nonEmpty)
          require(wapBranch.isEmpty || !over,
            s"INSERT OVERWRITE graft.$name cannot target WAP branch " +
              s"'${wapBranch.get}' — branches stage appends and row-level " +
              "DML, not overwrites (unset spark.wap.branch to overwrite " +
              "the live table)")
          if (over && i.partitionSpec.nonEmpty) {
            if (fullyStatic) t.overwriteStaticRegion(staticSpec, df) // the NAMED region, both modes
            else if (dynamicMode) t.overwritePartitions(df) // only the batch's tuples
            else if (staticSpec.nonEmpty) t.overwriteStaticRegion(staticSpec, df) // static mode: whole static-prefix region
            else t.overwrite(df) // fully dynamic spec ≡ no spec, static mode: whole table
          } else if (over) {
            // honor Spark's dynamic partition-overwrite mode: replace
            // only the batch's partitions on partitioned tables
            if (dynamicMode && t.meta.partitionBy.exists(_.trim.nonEmpty))
              t.overwritePartitions(df)
            else t.overwrite(df)
          } else wapBranch match {
            case Some(br) => t.stageAppendInto(df, br)
            case None     => t.append(df)
          }
        }): LogicalPlan
      }.getOrElse(refuseIfView(name, "INSERT", i))
    case m: MergeIntoTable if (m.targetTable match {
        case GraftTarget(_, _) => true
        case _ => false
      }) =>
      val GraftTarget(name, tAlias) = m.targetTable: @unchecked
      loadTable(name).map(t => buildMerge(m, t, name, tAlias))
        .getOrElse(refuseIfView(name, "MERGE", m))
    // `WHERE c = <lit>` directly over a graft relation: resolve to the
    // MANIFEST-PRUNED scan (column bounds + Bloom filters,
    // [[ManagedTable.readWhereEq]]) instead of the full scan — the filter
    // is kept on top (pruning opens a superset of the matching groups),
    // so semantics are identical and the win is groups never opened. The
    // planning-time analogue of parquet row-group bloom pruning, one
    // level up.
    // `FROM graft.t [ORDER BY c …] LIMIT n` — analysis-time GROUP
    // truncation, the SQL spelling of the V2 scan's pushed limit/top-N
    // (ONE shared implementation: [[graft.tables.StatsPrune]]). Only the
    // RELATION is rewritten to a pruned merge-on-read scan; the
    // Sort/Project/Limit above are kept verbatim, so semantics never
    // depend on the truncation, and every ineligible shape (a Filter in
    // between, MoR states, an active wap branch, missing stats) falls
    // through to the normal resolution.
    case gl @ GlobalLimit(Literal(n: Int, org.apache.spark.sql.types.IntegerType),
        ll @ LocalLimit(_, limChild)) if n > 0 =>
      truncatedLimitChild(limChild, n)
        .map(c => gl.copy(child = ll.copy(child = c))).getOrElse(gl)
    case f @ Filter(cond, u: UnresolvedRelation) if isGraft(u) &&
        !u.multipartIdentifier(1).contains('$') =>
      val name = u.multipartIdentifier(1)
      // manifest pruning scans the LIVE snapshot — under an active
      // spark.wap.branch the read must see the staged view instead, so
      // pruning steps aside (correctness over the group-skip win). The
      // conf check comes FIRST: in the common wap-off case the extra
      // table load (metadata read + load-time sweep) must not tax every
      // filtered read.
      val wapActive = session.conf.getOption("spark.wap.branch")
        .filter(_.nonEmpty)
        .exists(b => loadTable(name).exists(_.branches().contains(b)))
      (if (wapActive) resolve(name)
       else resolvePruned(name, cond).orElse(resolve(name)))
        .map(child => Filter(cond, child)).getOrElse(f)
    case u: UnresolvedRelation if isGraft(u) =>
      resolve(u.multipartIdentifier(1)).getOrElse(u)
  }

  private def isGraft(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft")

  /** `WHERE …` over a `VERSION AS OF '<ref>'` read (round 9): composite
    * pruning against the PINNED manifest — retained manifests carry the
    * same bounds/Blooms/tuples, so a time-travel audit query prunes like
    * a live read instead of paying a full scan. Called from
    * [[ResolveGraftDdl]] (time travel resolves at the PARSE seam, before
    * this resolution rule would see the node); None = not a graft
    * version-ref read or nothing prunable — the caller's plain pinned
    * resolution takes over.
    */
  private[plans] def prunedTimeTravel(cond: Expression,
      tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel)
      : Option[LogicalPlan] = tt.relation match {
    case u: UnresolvedRelation if isGraft(u) &&
        !u.multipartIdentifier(1).contains('$') && tt.version.exists(_.nonEmpty) =>
      resolvePruned(u.multipartIdentifier(1), cond, tt.version)
        .map(child => Filter(cond, child))
    case _ => None
  }

  /** The session's `spark.wap.branch` when it names a live branch of
    * `t` — the branch plain reads of `t` must observe. READS ONLY: an
    * absent branch falls back to the live snapshot (one session conf
    * audits just the tables actually staged on).
    */
  private def wapBranchOn(t: ManagedTable): Option[String] =
    session.conf.getOption("spark.wap.branch").filter(_.nonEmpty)
      .filter(t.branches().contains)

  /** The session's `spark.wap.branch` for WRITE routing — writes under
    * the conf ALWAYS target the branch (created on first touch, like
    * INSERT's stageAppendInto): a misspelled or not-yet-staged branch
    * name must stage, never silently mutate the live table mid-audit.
    */
  private def wapWriteBranch: Option[String] =
    session.conf.getOption("spark.wap.branch").filter(_.nonEmpty)

  /** A `$`-suffixed graft identifier appearing as a DML target — always
    * a mistake; refuse with a precise message instead of letting the
    * metadata scan resolve and Spark die on an internal error.
    */
  private object GraftMetaTarget {
    def unapply(p: LogicalPlan): Option[String] = p match {
      case SubqueryAlias(_, u: UnresolvedRelation) if isGraft(u) &&
          u.multipartIdentifier(1).contains('$') => Some(u.multipartIdentifier(1))
      case u: UnresolvedRelation if isGraft(u) &&
          u.multipartIdentifier(1).contains('$') => Some(u.multipartIdentifier(1))
      case _ => None
    }
  }

  private def readOnly(full: String, stmt: LogicalPlan): Nothing =
    throw new IllegalArgumentException(
      s"graft.$full is a read-only view (time travel / metadata table); " +
        s"DML must target the base table (statement: ${stmt.nodeName})")

  /** DML target: a `graft.<t>` relation, optionally behind the
    * statement's alias. Metadata suffixes (`$files`…) are not writable.
    */
  private object GraftTarget {
    def unapply(p: LogicalPlan): Option[(String, Option[String])] = p match {
      case SubqueryAlias(id, u: UnresolvedRelation) if isGraft(u) &&
          !u.multipartIdentifier(1).contains('$') =>
        Some((u.multipartIdentifier(1), Some(id.name)))
      case u: UnresolvedRelation if isGraft(u) &&
          !u.multipartIdentifier(1).contains('$') =>
        Some((u.multipartIdentifier(1), None))
      case _ => None
    }
  }

  private def loadTable(name: String): Option[ManagedTable] =
    session.conf.getOption("spark.graft.warehouse")
      .flatMap(wh => ManagedTable.load(session, wh, name))

  /** DML whose graft target is a persisted VIEW: a precise refusal
    * instead of letting the relation case resolve the view body into a
    * scan and Spark die on an unwritable-relation internal error.
    */
  private def refuseIfView(name: String, stmt: String,
                           fallback: LogicalPlan): LogicalPlan =
    session.conf.getOption("spark.graft.warehouse") match {
      case Some(wh) if graft.tables.ViewStore.exists(session, wh, name) =>
        throw new IllegalArgumentException(
          s"graft.$name is a view: $stmt must target a managed table " +
            "(views are read-only)")
      case _ => fallback
    }

  /** Drop the statement alias qualifier so the expression resolves
    * against the bare table scan (`DELETE FROM graft.t AS x WHERE x.c`).
    */
  private def stripQualifier(e: Expression, alias: Option[String]): Expression =
    alias.map { a =>
      e.transform {
        case attr: UnresolvedAttribute if attr.nameParts.length > 1 &&
            attr.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(attr.nameParts.tail)
      }
    }.getOrElse(e)

  private def assignName(key: Expression): String = key match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => throw new IllegalArgumentException(
      s"unsupported assignment target $other (nested fields are not assignable)")
  }

  /** SQL MERGE → [[ManagedTable.mergeInto]]. Supported surface (errors
    * are raised at analysis, before anything runs):
    *  - ON: equality between target and source on exactly the table's
    *    identifier columns (mergeInto's join IS the identifier equality)
    *  - WHEN MATCHED: at most one UPDATE (SET … or SET *) and one DELETE,
    *    in either order — SQL's first-match-wins clause order is encoded
    *    into the conditions
    *  - WHEN NOT MATCHED: at most one INSERT * (column-list inserts would
    *    need a source projection — write it into the USING subquery)
    *  - WHEN NOT MATCHED BY SOURCE: at most one UPDATE SET … and one
    *    DELETE, either order (first-match-wins folded into conditions,
    *    like the matched branch); clauses may reference only the target —
    *    a source reference is rejected here with a precise error. This is
    *    the full-sync/re-snapshot shape: it pays one full target pass (a
    *    key anti-join, broadcast when the source is small) on top of the
    *    O(batch) matched branch; the write stays diff-sized.
    */
  private def buildMerge(m: MergeIntoTable, t: ManagedTable, name: String,
                         tAlias: Option[String]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertAction, InsertStarAction, UpdateAction, UpdateStarAction}
    val (sourcePlan, sAlias) = m.sourceTable match {
      case SubqueryAlias(id, child) => (child, Some(id.name))
      case other => (other, None)
    }
    // ONE pass over the attributes: sequential requalification would
    // capture when the user's aliases collide with the fixed names
    // (target AS p USING ... AS t: p→t then t→s corrupts the target
    // side) or are swapped. Target alias wins if both name one qualifier.
    def remap(e: Expression): Expression = e.transform {
      case attr: UnresolvedAttribute if attr.nameParts.length > 1 =>
        val q = attr.nameParts.head
        if (tAlias.exists(q.equalsIgnoreCase))
          UnresolvedAttribute("t" +: attr.nameParts.tail)
        else if (sAlias.exists(q.equalsIgnoreCase))
          UnresolvedAttribute("s" +: attr.nameParts.tail)
        else attr
    }
    // ON must be identifier equality: each conjunct equates one id column
    // across the two sides; together they cover the id set exactly
    val ids = t.meta.identifierFields
    require(ids.nonEmpty, s"MERGE INTO graft.$name: table has no identifier fields")
    def sideName(e: Expression): Option[(Option[String], String)] = e match {
      case a: UnresolvedAttribute =>
        val qual = if (a.nameParts.length > 1)
          Some(a.nameParts.head.toLowerCase) else None
        Some((qual, a.nameParts.last))
      case _ => None
    }
    val equated = splitConjuncts(remap(m.mergeCondition)).map {
      case eq @ EqualTo(l, r) =>
        (sideName(l), sideName(r)) match {
          case (Some((ql, a)), Some((qr, b))) if a.equalsIgnoreCase(b) =>
            // both sides carrying the SAME qualifier (t.id = t.id /
            // s.id = s.id) is a cross-side equality in name only — it
            // would silently execute as the identifier join
            require(ql.isEmpty || qr.isEmpty || ql != qr,
              s"MERGE INTO graft.$name: ON conjunct ${eq.sql} references one side twice")
            a.toLowerCase
          case _ => throw new IllegalArgumentException(
            s"MERGE INTO graft.$name: ON must equate same-named identifier columns, got ${eq.sql}")
        }
      case other => throw new IllegalArgumentException(
        s"MERGE INTO graft.$name: ON must be a conjunction of equalities, got ${other.sql}")
    }.toSet
    require(equated == ids.map(_.toLowerCase).toSet,
      s"MERGE INTO graft.$name: ON must equate exactly the identifier columns ${ids.mkString(", ")}")
    // matched clauses → (updateWhen, updateSet, deleteWhen) with SQL's
    // first-match-wins order folded into the conditions
    var updateWhen: Option[Expression] = None
    var updateSet: Map[String, Expression] = Map.empty
    var deleteWhen: Option[Expression] = None
    var updateSeen = false; var deleteSeen = false
    m.matchedActions.foreach {
      case UpdateAction(c, assigns, fromStar) =>
        require(!updateSeen, s"MERGE INTO graft.$name: at most one WHEN MATCHED UPDATE")
        updateSeen = true
        val cond = remap(c.getOrElse(Literal.TrueLiteral))
        updateWhen = Some(if (deleteSeen)
          And(cond, notTrue(deleteWhen.getOrElse(Literal.FalseLiteral))) else cond)
        updateSet =
          if (fromStar) Map.empty
          else assigns.map(a => assignName(a.key) -> remap(a.value)).toMap
      case UpdateStarAction(c) =>
        require(!updateSeen, s"MERGE INTO graft.$name: at most one WHEN MATCHED UPDATE")
        updateSeen = true
        val cond = remap(c.getOrElse(Literal.TrueLiteral))
        updateWhen = Some(if (deleteSeen)
          And(cond, notTrue(deleteWhen.getOrElse(Literal.FalseLiteral))) else cond)
      case DeleteAction(c) =>
        require(!deleteSeen, s"MERGE INTO graft.$name: at most one WHEN MATCHED DELETE")
        deleteSeen = true
        val cond = remap(c.getOrElse(Literal.TrueLiteral))
        // mergeInto checks DELETE before UPDATE; if SQL wrote UPDATE
        // first, a row matching both must update — mask the delete
        deleteWhen = Some(if (updateSeen)
          And(cond, notTrue(updateWhen.getOrElse(Literal.FalseLiteral))) else cond)
      case other => throw new IllegalArgumentException(
        s"MERGE INTO graft.$name: unsupported WHEN MATCHED action $other")
    }
    // BY SOURCE clauses act on target rows with no source row at all, so
    // any source reference is meaningless; catch the remapped s-qualifier
    // here with a precise error instead of letting resolution fail on a
    // missing attribute deep in the anti-join plan
    def remapTargetOnly(e: Expression): Expression = {
      val r = remap(e)
      r.foreach {
        case a: UnresolvedAttribute if a.nameParts.length > 1 &&
            a.nameParts.head.equalsIgnoreCase("s") =>
          throw new IllegalArgumentException(
            s"MERGE INTO graft.$name: WHEN NOT MATCHED BY SOURCE clauses " +
              s"cannot reference the source (${a.sql} — no source row exists)")
        case _ =>
      }
      r
    }
    var updateBsWhen: Option[Expression] = None
    var updateBsSet: Map[String, Expression] = Map.empty
    var deleteBsWhen: Option[Expression] = None
    var updateBsSeen = false; var deleteBsSeen = false
    m.notMatchedBySourceActions.foreach {
      case UpdateAction(c, assigns, fromStar) =>
        require(!fromStar,
          s"MERGE INTO graft.$name: WHEN NOT MATCHED BY SOURCE UPDATE SET * " +
            "is meaningless (no source row exists) — write an explicit SET list")
        require(!updateBsSeen,
          s"MERGE INTO graft.$name: at most one WHEN NOT MATCHED BY SOURCE UPDATE")
        updateBsSeen = true
        val cond = remapTargetOnly(c.getOrElse(Literal.TrueLiteral))
        updateBsWhen = Some(if (deleteBsSeen)
          And(cond, notTrue(deleteBsWhen.getOrElse(Literal.FalseLiteral))) else cond)
        updateBsSet = assigns.map(a =>
          assignName(a.key) -> remapTargetOnly(a.value)).toMap
      case DeleteAction(c) =>
        require(!deleteBsSeen,
          s"MERGE INTO graft.$name: at most one WHEN NOT MATCHED BY SOURCE DELETE")
        deleteBsSeen = true
        val cond = remapTargetOnly(c.getOrElse(Literal.TrueLiteral))
        deleteBsWhen = Some(if (updateBsSeen)
          And(cond, notTrue(updateBsWhen.getOrElse(Literal.FalseLiteral))) else cond)
      case other => throw new IllegalArgumentException(
        s"MERGE INTO graft.$name: unsupported WHEN NOT MATCHED BY SOURCE action $other")
    }
    var insertWhen: Option[Expression] = None
    m.notMatchedActions.foreach {
      case InsertStarAction(c) =>
        require(insertWhen.isEmpty, s"MERGE INTO graft.$name: at most one WHEN NOT MATCHED INSERT")
        insertWhen = Some(remap(c.getOrElse(Literal.TrueLiteral)))
      case _: InsertAction => throw new IllegalArgumentException(
        s"MERGE INTO graft.$name: only INSERT * is supported — project the " +
          "column list inside the USING subquery instead")
      case other => throw new IllegalArgumentException(
        s"MERGE INTO graft.$name: unsupported WHEN NOT MATCHED action $other")
    }
    val src = sourcePlan
    val updWhen = updateWhen; val updSet = updateSet
    val delWhen = deleteWhen; val insWhen = insertWhen
    val updBsWhen = updateBsWhen; val updBsSet = updateBsSet
    val delBsWhen = deleteBsWhen
    GraftDmlCommand("MERGE", name, () => {
      t.mergeInto(GraftBridge.dataFrame(session, src),
        updateWhen = updWhen.map(GraftBridge.column),
        updateSet = updSet.map { case (k, v) => k -> GraftBridge.column(v) },
        deleteWhen = delWhen.map(GraftBridge.column),
        insertWhen = insWhen.map(GraftBridge.column),
        deleteBySourceWhen = delBsWhen.map(GraftBridge.column),
        updateBySourceWhen = updBsWhen.map(GraftBridge.column),
        updateBySourceSet = updBsSet.map { case (k, v) => k -> GraftBridge.column(v) },
        stageToBranch = wapWriteBranch) // spark.wap.branch: stage, don't commit
    })
  }

  /** NOT(cond is true) — the clause-order mask. A bare `Not(cond)` is
    * NULL when `cond` is NULL and mergeInto coalesces NULL clause
    * conditions to false, which would skip the later clause for rows
    * where the earlier clause's condition was merely UNKNOWN — breaking
    * SQL's first-match-wins fall-through.
    */
  private def notTrue(cond: Expression): Expression =
    Not(org.apache.spark.sql.catalyst.expressions.Coalesce(
      Seq(cond, Literal.FalseLiteral)))

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** The COMPOSITE pruned scan over every prunable conjunct
    * ([[ManagedTable.readPrunedConjunction]]): per column, ranges and
    * equalities fold into one inclusive-bounds conjunct, and candidate
    * entry sets intersect across conjuncts — bounds ∧ Bloom ∧
    * partition-tuple per conjunct. The caller keeps the original filter
    * on top, so pruning only ever opens a superset of the matching
    * groups.
    */
  /** Is this projection list PLAIN — only stars and bare column
    * references? Anything else refuses the LIMIT rewrite: at this
    * pre-resolution point an expression could still turn out to be a
    * generator (`explode` parses as an UnresolvedFunction) or a window
    * function — both non-row-preserving, so a truncated input would
    * produce wrong output — and an Alias could SHADOW the sort column
    * (`SELECT name AS ts … ORDER BY ts` sorts by name, not the table's
    * ts the truncation would prune on).
    */
  private def plainProjection(
      list: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Boolean =
    list.forall {
      case _: org.apache.spark.sql.catalyst.analysis.UnresolvedStar => true
      case _: UnresolvedAttribute => true
      case _ => false
    }

  /** The bare `graft.<t>` relation under a LIMIT-eligible shape (through
    * SubqueryAlias wrappers and PLAIN projections only — any other
    * operator or expression, e.g. a Filter, an aliasing Project, a
    * not-yet-resolved generator/window, makes the shape ineligible), or
    * None.
    */
  private def bareGraftUnder(p: LogicalPlan): Option[UnresolvedRelation] = p match {
    case u: UnresolvedRelation
        if isGraft(u) && !u.multipartIdentifier(1).contains('$') => Some(u)
    case SubqueryAlias(_, q)  => bareGraftUnder(q)
    case Project(list, q) if plainProjection(list) => bareGraftUnder(q)
    case _                    => None
  }

  /** Replace the bare relation with `replacement`, keeping every
    * wrapper [[bareGraftUnder]] admitted (alias references must
    * survive).
    */
  private def swapBareGraft(p: LogicalPlan, replacement: LogicalPlan): LogicalPlan =
    p match {
      case _: UnresolvedRelation => replacement
      case sa @ SubqueryAlias(_, q) => sa.copy(child = swapBareGraft(q, replacement))
      case pj @ Project(_, q)       => pj.copy(child = swapBareGraft(q, replacement))
      case other                    => other
    }

  /** The LIMIT rewrite's child: a Sort on top takes the top-N rule
    * (first sort key + direction + null ordering; dominance is STRICT
    * always — see [[graft.tables.StatsPrune.topNTruncate]]), a plain
    * projection takes the row-count prefix rule. None = ineligible →
    * normal resolution.
    */
  private def truncatedLimitChild(child: LogicalPlan, n: Int): Option[LogicalPlan] = {
    def loadEligible(u: UnresolvedRelation): Option[ManagedTable] =
      loadTable(u.multipartIdentifier(1)).filter(t => wapBranchOn(t).isEmpty)
    child match {
      case s @ Sort(orders, true, inner, _) if orders.nonEmpty =>
        // the subquery-alias qualifier (if any) the sort key may carry
        def aliasOf(p: LogicalPlan): Option[String] = p match {
          case SubqueryAlias(id, _) => Some(id.name)
          case Project(_, q)        => aliasOf(q)
          case _                    => None
        }
        val resolver = session.sessionState.analyzer.resolver
        // ONLY a bare top-level column (`c`) or the relation's alias
        // qualifying it (`x.c`): a multi-part reference whose LAST part
        // happens to match a top-level column (e.g. a struct field
        // `s.c`) must NOT prune on that column's stats — the kept Sort
        // orders by something else entirely
        val colName = orders.head.child match {
          case a: UnresolvedAttribute if a.nameParts.length == 1 =>
            Some(a.nameParts.head)
          case a: UnresolvedAttribute if a.nameParts.length == 2 &&
              aliasOf(inner).exists(resolver(_, a.nameParts.head)) =>
            Some(a.nameParts.last)
          case _ => None
        }
        for {
          c <- colName
          u <- bareGraftUnder(inner)
          t <- loadEligible(u)
          field <- t.meta.schema.fields.find(f =>
            session.sessionState.analyzer.resolver(f.name, c))
          pruned <- t.readTopNPruned(field.name,
            asc = orders.head.direction == Ascending,
            nullsFirst = orders.head.nullOrdering == NullsFirst, n = n)
        } yield s.copy(child = swapBareGraft(inner, pruned.queryExecution.analyzed))
      case other =>
        for {
          u <- bareGraftUnder(other)
          t <- loadEligible(u)
          pruned <- t.readLimitPruned(n)
        } yield swapBareGraft(other, pruned.queryExecution.analyzed)
    }
  }

  private def resolvePruned(name: String, cond: Expression,
                            ref: Option[String] = None): Option[LogicalPlan] = {
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
      // COMPOSITE pruning (round 9): every prunable conjunct contributes —
      // bounds are grouped PER COLUMN (equality contributed both bounds
      // above, so `k = 5` becomes the closed range [5, 5] and Bloom-probes)
      // and the per-conjunct candidate sets INTERSECT inside
      // readPrunedConjunction (bounds ∧ Bloom ∧ partition-tuple per
      // conjunct) — `WHERE k = 5 AND day >= X` prunes multiplicatively.
      // Multiple bounds on one side fold to the TIGHTEST
      // ([[ManagedTable.tightestBound]], shared with the V1 seam)
      val rangePreds = ranges.groupBy(_._1).toSeq.flatMap { case (colName, bs) =>
        t.meta.schema.fields.find(_.name.equalsIgnoreCase(colName)).flatMap { fld =>
          val lo = ManagedTable.tightestBound(
            bs.collect { case (_, true, l) => l }.flatMap(extValue(fld, _)),
            takeMax = true)
          val hi = ManagedTable.tightestBound(
            bs.collect { case (_, false, l) => l }.flatMap(extValue(fld, _)),
            takeMax = false)
          if (lo.isEmpty && hi.isEmpty) None
          else Some(ManagedTable.PruneConjunct(fld.name, lo, hi))
        }
      }
      // IN lists (round 9): any-value-may-be-present probing. Null
      // members never match a row (three-valued IN), so they drop from
      // the probe list; the REMAINING values must ALL convert to the
      // column domain — one coercion-suspect member could match rows
      // via Spark's own casting in groups the other values would prune.
      val inPreds = conjuncts(cond).flatMap {
        case In(a: UnresolvedAttribute, ls)
            if ls.nonEmpty && ls.forall(_.isInstanceOf[Literal]) =>
          t.meta.schema.fields.find(_.name.equalsIgnoreCase(a.nameParts.last))
            .flatMap { fld =>
              val lits = ls.map(_.asInstanceOf[Literal]).filter(_.value != null)
              val vs = lits.map(extValue(fld, _))
              if (vs.exists(_.isEmpty)) None
              else Some(ManagedTable.PruneConjunct(fld.name, None, None,
                Some(vs.flatten)))
            }
        case _ => None
      }
      val preds = rangePreds ++ inPreds
      if (preds.isEmpty) None
      else {
        val pruned = t.readPrunedConjunction(preds, ref)
        // Projection must match what the UNPRUNED path would output, or
        // adding a prunable WHERE silently changes the schema: live and
        // branch reads project to the table schema (read()/readBranch),
        // while snapshot/tag reads surface derived partition columns
        // (readVersion is unprojected) — keep the physical columns there
        // so e.g. a filter on a derived column still resolves on top.
        val branchView = ref.exists(r => !r.forall(_.isDigit) &&
          !t.tags().contains(r) && t.branches().contains(r))
        val versionRead = ref.isDefined && !branchView
        Some(if (versionRead) pruned.queryExecution.analyzed else logical(pruned))
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
    ManagedTable.load(session, wh.get, name) match {
      case Some(t) =>
        val df = suffix match {
          // `spark.wap.branch`: session-scoped write-audit-publish
          // context (round 8, Iceberg's WAP conf) — plain reads see the
          // branch's staged view when the branch exists on THIS table;
          // an absent branch falls back to the live snapshot, so one
          // session conf audits just the tables actually staged on.
          case None => Some(wapBranchOn(t).map(t.readBranch).getOrElse(t.read()))
          case Some(s) if s.startsWith("branch_") &&
              t.branches().contains(s.stripPrefix("branch_")) =>
            Some(t.readBranch(s.stripPrefix("branch_")))
          case Some("files")      => Some(t.filesMetadata())
          case Some("snapshots")  => Some(t.snapshotsMetadata())
          case Some("refs")       => Some(t.refsMetadata())
          case Some("partitions") => Some(t.partitionsMetadata())
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
      case None if suffix.isEmpty => expandView(wh.get, name)
      case None => None
    }
  }

  /** Thread-local stack of views currently being expanded — expansion is
    * EAGER (the body is parsed and fully analyzed inside this call, so
    * nested views expand within the same stack), which makes a cyclic
    * definition a precise error instead of an analyzer max-iterations
    * blowup.
    */
  private val viewStack = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  /** `graft.<name>` where no managed table exists: a persisted VIEW
    * ([[graft.tables.ViewStore]]) expands to its body's re-parsed,
    * re-analyzed plan — through the full parser seam, so time travel,
    * metadata suffixes and nested views inside the body all work, and
    * the view always sees the tables' current state and schema.
    */
  private def expandView(wh: String, name: String): Option[LogicalPlan] =
    graft.tables.ViewStore.load(session, wh, name).map { sql =>
      val stack = viewStack.get()
      if (stack.exists(_.equalsIgnoreCase(name)))
        throw new IllegalArgumentException(
          s"cyclic view reference: ${(name :: stack).reverse.mkString(" -> ")}")
      viewStack.set(name :: stack)
      try {
        val parsed = session.sessionState.sqlParser.parsePlan(sql)
        SubqueryAlias(name,
          GraftBridge.dataFrame(session, parsed).queryExecution.analyzed)
      } finally viewStack.set(stack)
    }
}
