package graft.plans

import graft.tables.ManagedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedTable}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.types.{StructField, StructType}

/** SQL DDL over graft tables — the statements that complete the SQL
  * lakehouse surface next to [[ResolveGraftTables]]' reads and DML:
  *
  *   CREATE TABLE graft.t (id BIGINT, …) PARTITIONED BY (day(ts), bucket(4, id))
  *     TBLPROPERTIES ('graft.identifier-fields'='id', …)
  *   DROP TABLE [IF EXISTS] graft.t
  *   ALTER TABLE graft.t ADD COLUMNS (c TYPE, …)     — schema evolution D6
  *   ALTER TABLE graft.t DROP COLUMN c / RENAME COLUMN a TO b
  *   ALTER TABLE graft.t SET TBLPROPERTIES (…)
  *   ALTER TABLE graft.t ADD|DROP|REPLACE PARTITION FIELD … — spec evolution
  *   ALTER TABLE graft.t SET IDENTIFIER FIELDS a, b  — re-key (plain-data gated)
  *   ALTER TABLE graft.t WRITE ORDERED BY … / WRITE UNORDERED — D5's SQL form
  *
  * Identifier fields ride the `graft.identifier-fields` table property
  * (Spark's DDL grammar has no key-constraint clause to carry them).
  * Partition transforms map 1:1 onto the spec grammar the reference
  * parses (`SINK/IcebergUtil.java:214-305`): identity, years/months/
  * days/hours, bucket, truncate. Everything executes as an eager
  * command, like the DML surface.
  */
class ResolveGraftDdl(session: SparkSession) extends Rule[LogicalPlan] {

  private val IdsProp = "graft.identifier-fields"

  /** The read-side rule, for the shared pruned-scan machinery
    * ([[ResolveGraftTables.prunedTimeTravel]]).
    */
  private lazy val tables = new ResolveGraftTables(session)

  /** Aggregate/Project nodes whose PARENT still needs their shape: a
    * HAVING clause resolves against the child Aggregate (replacing it
    * with a LocalRelation would strand the aggregate condition in a
    * plain Filter and fail analysis), and an ORDER BY carrying any
    * function call may need the analyzer to push it INTO the aggregate.
    * The manifest-answer rewrites below must not fire on these — falling
    * through to the real plan is always correct, just unoptimized.
    * Identity-based: the same textual subtree elsewhere is unaffected.
    */
  private def havingGuarded(plan: LogicalPlan): java.util.Set[LogicalPlan] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case h: org.apache.spark.sql.catalyst.analysis.UnresolvedHaving =>
        s.add(h.child)
      case so: org.apache.spark.sql.catalyst.plans.logical.Sort
          if so.order.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedFunction])) =>
        s.add(so.child)
      case _ => ()
    }
    s
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val guarded = havingGuarded(plan)
    applyRules(plan, guarded)
  }

  private def applyRules(plan: LogicalPlan,
                         guarded: java.util.Set[LogicalPlan]): LogicalPlan =
    plan.resolveOperatorsDown {
    // filtered version-ref reads prune against the pinned manifest
    // (round 9); falling through unchanged lets the recursion resolve
    // the child via the bare RelationTimeTravel case below
    case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
        tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel) =>
      tables.prunedTimeTravel(cond, tt).getOrElse(f)
    case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
      timeTravel(tt).getOrElse(tt)
    case st: org.apache.spark.sql.catalyst.plans.logical.ShowTables =>
      showTables(st).getOrElse(st)
    case d: org.apache.spark.sql.catalyst.plans.logical.DescribeRelation =>
      describeTable(d).getOrElse(d)
    case sc: org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable =>
      showCreateTable(sc).getOrElse(sc)
    case sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions =>
      showPartitions(sp).getOrElse(sp)
    // `SELECT count(*)/min(c)/max(c) FROM graft.t` answered from the
    // MANIFEST when exact (all-data-kind groups with recorded row counts
    // / column bounds) — Iceberg's snapshot-summary / manifest-bounds
    // answers: milliseconds instead of a 100 TB scan. MoR tables (hidden
    // rows) and bound-less columns fall through to the real plan.
    // Snapshot-at-statement semantics, BY DESIGN: the value is pinned
    // when the statement is planned, exactly like every `graft.t`
    // relation ([[ResolveGraftTables]] resolves to `t.read()`'s analyzed
    // plan, whose manifest was read at resolution — the Iceberg scan-
    // plans-pin-a-snapshot model). A retained DataFrame re-collected
    // after later commits returns the planned snapshot on BOTH paths;
    // re-issue `spark.sql(...)` to observe new commits.
    case p @ Project(projs, GraftAggSource(name, ref))
        if !guarded.contains(p) && projs.nonEmpty &&
          projs.forall(manifestAggOf(_).isDefined) =>
      session.conf.getOption("spark.graft.warehouse")
        .flatMap(wh => ManagedTable.load(session, wh, name))
        // an active spark.wap.branch routes plain READS of this table to
        // the branch's staged view (ResolveGraftTables) — the manifest
        // answer reads the LIVE snapshot and would silently disagree
        // with SELECT *; fall through to the real (branch) plan. An
        // EXPLICIT ref read is unaffected by wap (round 10) — the table
        // layer refuses branch-name refs itself.
        .filterNot(t => ref.isEmpty && session.conf.getOption("spark.wap.branch")
          .filter(_.nonEmpty).exists(t.branches().contains))
        .flatMap(manifestAnswer(_, projs.map(manifestAggOf(_).get), ref))
        .getOrElse(p)
    // `SELECT day, …, count(*)/min(c)/max(c) FROM graft.t GROUP BY day, …`
    // where every grouping column is an identity partition source:
    // per-tuple answers from per-entry row counts and bounds (the Iceberg
    // partitions-metadata-table rollup) — same exactness gates and
    // snapshot-at-statement semantics as the bare aggregate above; see
    // [[ManagedTable.manifestGroupedAgg]].
    case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if !guarded.contains(agg) &&
          GraftAggSource.unapply(agg.child).isDefined &&
          agg.groupingExpressions.nonEmpty &&
          agg.groupingExpressions.forall {
            case g: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
              g.nameParts.length == 1
            case _ => false
          } => {
      val (name, ref) = GraftAggSource.unapply(agg.child).get
      groupedManifestAnswer(agg, name, ref).getOrElse(agg)
    }
    case c @ CreateTable(UnresolvedIdentifier(Seq(g, name), _), columns,
        partitioning, spec: UnresolvedTableSpec, ifNotExists)
        if g.equalsIgnoreCase("graft") =>
      val wh = warehouse(name)
      val schema = StructType(columns.map(cd =>
        StructField(cd.name, cd.dataType, cd.nullable)))
      val props = spec.properties
      val ids = props.get(IdsProp).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      ids.foreach(i => require(schema.fieldNames.contains(i),
        s"CREATE TABLE graft.$name: identifier field '$i' is not a declared column"))
      val partitionBy = partitioning.map(transformToSpec(name, _))
      GraftDmlCommand("CREATE TABLE", name, () => {
        require(!graft.tables.ViewStore.exists(session, wh, name),
          s"CREATE TABLE graft.$name: a view with this name exists")
        if (!(ifNotExists && ManagedTable.load(session, wh, name).isDefined))
          ManagedTable.create(session, wh, name, schema, ids, partitionBy,
            props - IdsProp): Unit
      })
    case c @ CreateTableAsSelect(UnresolvedIdentifier(Seq(g, name), _),
        partitioning, query, spec: UnresolvedTableSpec, _, ifNotExists, _)
        if g.equalsIgnoreCase("graft") =>
      val wh = warehouse(name)
      val props = spec.properties
      val ids = props.get(IdsProp).toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      val partitionBy = partitioning.map(transformToSpec(name, _))
      GraftDmlCommand("CREATE TABLE AS SELECT", name, () => {
        require(!graft.tables.ViewStore.exists(session, wh, name),
          s"CREATE TABLE graft.$name: a view with this name exists")
        if (!(ifNotExists && ManagedTable.load(session, wh, name).isDefined)) {
          val df = org.apache.spark.sql.graftbridge.GraftBridge.dataFrame(session, query)
          ids.foreach(i => require(df.schema.fieldNames.contains(i),
            s"CREATE TABLE graft.$name: identifier field '$i' is not produced by the query"))
          val t = ManagedTable.create(session, wh, name, df.schema, ids,
            partitionBy, props - IdsProp)
          t.append(df)
        }
      })
    case d @ DropTable(UnresolvedIdentifier(Seq(g, name), _), ifExists, _)
        if g.equalsIgnoreCase("graft") =>
      val wh = warehouse(name)
      GraftDmlCommand("DROP TABLE", name, () => {
        val exists = ManagedTable.load(session, wh, name).isDefined
        if (!exists && graft.tables.ViewStore.exists(session, wh, name))
          throw new IllegalArgumentException(
            s"graft.$name is a view (use DROP VIEW)")
        require(exists || ifExists, s"table graft.$name does not exist")
        if (exists) {
          val fs = graft.tables.TableMeta.fs(
            session.sparkContext.hadoopConfiguration, wh)
          fs.delete(new org.apache.hadoop.fs.Path(wh, name), true): Unit
        }
      })
    // CREATE [OR REPLACE] VIEW graft.v AS <query> — the definition is the
    // body's ORIGINAL SQL TEXT, stored warehouse-adjacent
    // ([[graft.tables.ViewStore]]) and re-resolved at every reference
    // (standard view semantics: the view sees the tables' CURRENT state
    // and schema — Spark's SCHEMA EVOLUTION view mode). Time travel,
    // metadata suffixes and nested views all work inside the body because
    // expansion re-enters the full parser + rule stack. The body is
    // analyzed eagerly here so a broken definition fails at CREATE, not
    // at first use. TEMP views need nothing: Spark's session-local temp
    // view machinery already resolves graft relations in the body.
    case cv @ CreateView(UnresolvedIdentifier(Seq(g, name), _), userCols,
        _, _, _, originalText, _, allowExisting, replace, _)
        if g.equalsIgnoreCase("graft") =>
      val wh = warehouse(name)
      require(userCols.isEmpty,
        s"CREATE VIEW graft.$name: a column list is not supported — alias " +
          "the columns in the view body instead")
      val sql = originalText.getOrElse(throw new IllegalArgumentException(
        s"CREATE VIEW graft.$name: the view body must come from SQL text"))
      val (allowExist, repl) = (allowExisting, replace)
      GraftDmlCommand("CREATE VIEW", name, () => {
        require(ManagedTable.load(session, wh, name).isEmpty,
          s"CREATE VIEW graft.$name: a managed table with this name exists")
        val exists = graft.tables.ViewStore.exists(session, wh, name)
        if (exists && !repl && !allowExist) throw new IllegalArgumentException(
          s"view graft.$name already exists (use CREATE OR REPLACE VIEW)")
        if (!exists || repl) {
          // fail fast on a body that does not analyze
          org.apache.spark.sql.graftbridge.GraftBridge.dataFrame(session,
            session.sessionState.sqlParser.parsePlan(sql)).queryExecution.analyzed
          graft.tables.ViewStore.create(session, wh, name, sql, repl)
        }
      })
    case dv @ DropView(UnresolvedIdentifier(Seq(g, name), _), ifExists)
        if g.equalsIgnoreCase("graft") =>
      val wh = warehouse(name)
      GraftDmlCommand("DROP VIEW", name, () => {
        val dropped = graft.tables.ViewStore.drop(session, wh, name)
        if (!dropped && ManagedTable.load(session, wh, name).isDefined)
          throw new IllegalArgumentException(
            s"graft.$name is a managed table (use DROP TABLE)")
        require(dropped || ifExists, s"view graft.$name does not exist")
      })
    // ALTER VIEW graft.v AS <query> — replace the stored definition with
    // the new body's original SQL text (analyzed eagerly, like CREATE)
    case av @ AlterViewAs(child, originalText, _)
        if graftViewIdent(child).isDefined =>
      val name = graftViewIdent(child).get
      val wh = warehouse(name)
      GraftDmlCommand("ALTER VIEW", name, () => {
        if (!graft.tables.ViewStore.exists(session, wh, name)) {
          if (ManagedTable.load(session, wh, name).isDefined)
            throw new IllegalArgumentException(
              s"graft.$name is a managed table (ALTER VIEW applies to views)")
          throw new IllegalArgumentException(s"view graft.$name does not exist")
        }
        org.apache.spark.sql.graftbridge.GraftBridge.dataFrame(session,
          session.sessionState.sqlParser.parsePlan(originalText)).queryExecution.analyzed
        graft.tables.ViewStore.create(session, wh, name, originalText, replace = true)
      })
    case a @ AddColumns(GraftAlterTarget(name), cols) =>
      withTable(a, name) { t =>
        val fields = cols.map { qc =>
          require(qc.path.isEmpty,
            s"ALTER TABLE graft.$name: nested ADD COLUMNS is not supported")
          require(qc.position.isEmpty,
            s"ALTER TABLE graft.$name: column positions are not supported (columns append)")
          StructField(qc.colName, qc.dataType, nullable = true)
        }
        GraftDmlCommand("ALTER ADD COLUMNS", name,
          () => { t.evolve(StructType(fields)): Unit })
      }
    case d @ DropColumns(GraftAlterTarget(name), fields, ifExists) =>
      withTable(d, name) { t =>
        val names = fields.map(_.name.last)
        GraftDmlCommand("ALTER DROP COLUMNS", name, () => names.foreach { n =>
          if (!ifExists || t.meta.schema.fieldNames.contains(n)) t.dropColumn(n)
        })
      }
    case r @ RenameColumn(GraftAlterTarget(name), field, newName) =>
      withTable(r, name) { t =>
        GraftDmlCommand("ALTER RENAME COLUMN", name,
          () => t.renameColumn(field.name.last, newName))
      }
    case tr @ org.apache.spark.sql.catalyst.plans.logical.TruncateTable(
        GraftAlterTarget(name)) =>
      withTable(tr, name) { t =>
        GraftDmlCommand("TRUNCATE", name, () => t.truncate())
      }
    // `TRUNCATE TABLE graft.t PARTITION (k=v, …)` — the static-region
    // machinery with an empty batch: keyless tables drop the named
    // region's groups at metadata cost (zero rewrite), keyed tables
    // tombstone it so the changelog stays precise. Spec keys must be
    // identity partition sources, like INSERT … PARTITION.
    case tp @ org.apache.spark.sql.catalyst.plans.logical.TruncatePartition(
        GraftAlterTarget(name),
        org.apache.spark.sql.catalyst.analysis.UnresolvedPartitionSpec(m, _)) =>
      withTable(tp, name) { t =>
        val resolver = session.sessionState.analyzer.resolver
        val spec = m.toSeq.map { case (k, v) =>
          t.meta.schema.fields.find(f => resolver(f.name, k)).getOrElse(
            throw new IllegalArgumentException(
              s"TRUNCATE ... PARTITION graft.$name: unknown column '$k'")).name -> v
        }
        GraftDmlCommand("TRUNCATE PARTITION", name, () => {
          val empty = session.createDataFrame(
            session.sparkContext.emptyRDD[org.apache.spark.sql.Row], t.meta.schema)
          // overwriteStaticRegion owns the routing (keyed → tombstones,
          // keyless → metadata drop) and the identity/cast validation
          t.overwriteStaticRegion(spec, empty)
        })
      }
    case s @ SetTableProperties(GraftAlterTarget(name), props) =>
      withTable(s, name) { t =>
        require(!props.contains(IdsProp),
          s"ALTER TABLE graft.$name: use SET IDENTIFIER FIELDS to re-key " +
            "(the property form would skip the merge-on-read state guard)")
        GraftDmlCommand("ALTER SET TBLPROPERTIES", name,
          () => t.setProperties(props))
      }
    // `ALTER TABLE graft.t UNSET TBLPROPERTIES [IF EXISTS] (k, …)` —
    // the clear side of SET (round 10). Missing keys are a no-op either
    // way ([[ManagedTable.unsetProperties]] semantics); IF EXISTS is
    // accepted for compatibility.
    case s @ UnsetTableProperties(GraftAlterTarget(name), keys, _) =>
      withTable(s, name) { t =>
        GraftDmlCommand("ALTER UNSET TBLPROPERTIES", name,
          () => t.unsetProperties(keys))
      }
    // `SHOW TBLPROPERTIES graft.t [(key)]` — every live property (the
    // honest introspection surface: replication markers, refs, write
    // config all show; SHOW CREATE TABLE stays the curated round-trip
    // form). A named missing key fails precisely.
    case s: ShowTableProperties if (s.table match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
            u.multipartIdentifier.length == 2 &&
              u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
              !u.multipartIdentifier(1).contains('$')
          case _ => false
        }) => {
      val name = s.table
        .asInstanceOf[org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView]
        .multipartIdentifier(1)
      session.conf.getOption("spark.graft.warehouse")
        .flatMap(wh => ManagedTable.load(session, wh, name))
        .map { t =>
          val props = s.propertyKey match {
            case Some(k) => Map(k -> t.meta.properties.getOrElse(k,
              throw new IllegalArgumentException(
                s"SHOW TBLPROPERTIES graft.$name: no property '$k'")))
            case None => t.meta.properties
          }
          LocalRelation(s.output, props.toSeq.sortBy(_._1).map { case (k, v) =>
            org.apache.spark.sql.catalyst.InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(k),
              org.apache.spark.unsafe.types.UTF8String.fromString(v))
          })
        }
        .getOrElse(s)
    }
    // `CALL graft.system.<proc>(…)` — the Iceberg stored-procedure
    // analogue over the maintenance ladder: compact / compact_minor /
    // materialize_position_deletes / expire_snapshots /
    // rollback_to_version / maintenance. Eager commands returning
    // informational rows, like Iceberg's procedures.
    case org.apache.spark.sql.catalyst.plans.logical.Call(
        up: org.apache.spark.sql.catalyst.analysis.UnresolvedProcedure, args, _)
        if up.nameParts.length == 3 &&
          up.nameParts.head.equalsIgnoreCase("graft") &&
          up.nameParts(1).equalsIgnoreCase("system") =>
      procedureCommand(up.nameParts(2).toLowerCase(java.util.Locale.ROOT), args)
  }

  /** Snapshot-ref DDL (round 8): `ALTER TABLE graft.t CREATE|DROP
    * BRANCH|TAG name [AS OF VERSION n]` — recognized from the SQL text
    * by [[GraftSqlParser]] (Spark's grammar has no production for it)
    * and executed eagerly over [[ManagedTable]]'s tag/branch layer. The
    * table loads inside the command body, so EXPLAIN never touches it.
    */
  def refDdlCommand(name: String, verb: String, kind: String, ref: String,
                    version: Option[Long]): LogicalPlan = {
    require(version.isEmpty || (verb, kind) == (("CREATE", "TAG")),
      s"ALTER TABLE graft.$name $verb $kind: AS OF VERSION applies only to " +
        "CREATE TAG (branches stage onto the current snapshot)")
    def t = ManagedTable.load(session, warehouse(name), name).getOrElse(
      throw new IllegalArgumentException(s"table graft.$name does not exist"))
    GraftDmlCommand(s"ALTER $verb $kind", name, () => (verb, kind) match {
      case ("CREATE", "BRANCH") => t.createBranch(ref)
      case ("DROP", "BRANCH")   => t.abandonBranch(ref)
      case ("CREATE", "TAG")    => version.fold(t.tag(ref))(v => t.tag(ref, v))
      case ("DROP", "TAG")      => t.dropTag(ref)
      case other => throw new IllegalStateException(s"unreachable ref DDL $other")
    })
  }

  /** SQL-form partition transform text → the spec grammar string the
    * strict parser validates: `day(ts)` / `days(ts)`, `bucket(4, id)`
    * (either argument order), `truncate(8, c)`, or a bare identity
    * column. The TEXT seam's analogue of [[transformToSpec]].
    */
  private def unq(id: String): String = {
    val t = id.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length > 1)
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  private def sqlTransformToSpec(name: String, raw: String): String = {
    val Fn = """(?s)([A-Za-z_]+)\s*\(\s*(.+?)\s*\)""".r
    raw.trim match {
      case Fn(fn, argsRaw) =>
        val args = argsRaw.split(',').map(a => unq(a)).toSeq
        def one(): String = {
          require(args.length == 1,
            s"ALTER TABLE graft.$name: $fn takes one column, got '$raw'")
          args.head
        }
        fn.toLowerCase(java.util.Locale.ROOT) match {
          case "identity"         => one()
          case "years" | "year"   => s"year(${one()})"
          case "months" | "month" => s"month(${one()})"
          case "days" | "day"     => s"day(${one()})"
          case "hours" | "hour"   => s"hour(${one()})"
          case t @ ("bucket" | "truncate") =>
            require(args.length == 2,
              s"ALTER TABLE graft.$name: $t takes (N, column), got '$raw'")
            val (num, c) = args.head.toIntOption match {
              case Some(n) => (n, args(1))
              case None => (args(1).toIntOption.getOrElse(
                throw new IllegalArgumentException(
                  s"ALTER TABLE graft.$name: no numeric argument in '$raw'")), args.head)
            }
            s"$t($c,$num)"
          case other => throw new IllegalArgumentException(
            s"ALTER TABLE graft.$name: unsupported partition transform '$other'")
        }
      case bare => unq(bare)
    }
  }

  /** `ALTER TABLE graft.t ADD|DROP PARTITION FIELD <transform>` —
    * partition-spec EVOLUTION through SQL
    * ([[ManagedTable.updatePartitionSpec]]): metadata-only, nothing
    * rewritten; existing groups keep their epoch's layout, future writes
    * use the new spec. DROP matches the field's derived NAME (unique
    * within a spec), so `DROP PARTITION FIELD bucket(4, id)` and
    * `DROP PARTITION FIELD id_bucket`'s transform form both resolve.
    */
  def partitionFieldCommand(name: String, verb: String, field: String): LogicalPlan = {
    def t = ManagedTable.load(session, warehouse(name), name).getOrElse(
      throw new IllegalArgumentException(s"table graft.$name does not exist"))
    GraftDmlCommand(s"ALTER $verb PARTITION FIELD", name, () => {
      val tbl = t
      val cols = tbl.meta.schema.fieldNames.toSet
      val current = tbl.meta.partitionBy.map(_.trim).filter(_.nonEmpty)
      def nameOf(s: String): Option[String] =
        graft.tables.PartitionSpecParser.parse(Seq(s), cols).headOption.map(_.name)
      verb match {
        case "ADD" =>
          val spec = sqlTransformToSpec(name, field)
          val target = graft.tables.PartitionSpecParser
            .parse(Seq(spec), cols, strict = true).head
          require(!current.flatMap(nameOf).contains(target.name),
            s"ALTER TABLE graft.$name: partition field '${target.name}' already " +
              s"exists (spec: ${current.mkString(", ")})")
          tbl.updatePartitionSpec(current :+ spec)
        case "DROP" =>
          // a bare token naming a CURRENT field's derived name (id_bucket)
          // resolves to that field — derived names are not schema columns,
          // so the transform parse below could never see them
          val targetName = Some(unq(field))
            .filter(b => current.flatMap(nameOf).contains(b))
            .getOrElse(graft.tables.PartitionSpecParser
              .parse(Seq(sqlTransformToSpec(name, field)), cols, strict = true)
              .head.name)
          val keep = current.filterNot(s => nameOf(s).contains(targetName))
          require(keep.size < current.size,
            s"ALTER TABLE graft.$name: no partition field '$targetName' " +
              s"(spec: ${current.mkString(", ")})")
          tbl.updatePartitionSpec(keep)
        case other => throw new IllegalStateException(s"unreachable verb $other")
      }
    })
  }

  /** `ALTER TABLE graft.t REPLACE PARTITION FIELD <old> WITH <new>` —
    * one spec evolution (a single epoch boundary), not a DROP + ADD pair.
    */
  def replacePartitionFieldCommand(name: String, oldField: String,
                                   newField: String): LogicalPlan = {
    def t = ManagedTable.load(session, warehouse(name), name).getOrElse(
      throw new IllegalArgumentException(s"table graft.$name does not exist"))
    GraftDmlCommand("ALTER REPLACE PARTITION FIELD", name, () => {
      val tbl = t
      val cols = tbl.meta.schema.fieldNames.toSet
      val current = tbl.meta.partitionBy.map(_.trim).filter(_.nonEmpty)
      def nameOf(s: String): Option[String] =
        graft.tables.PartitionSpecParser.parse(Seq(s), cols).headOption.map(_.name)
      val newSpec = sqlTransformToSpec(name, newField)
      // the OLD side resolves like DROP: a current field's derived name
      // first, else a schema-validated transform
      val oldName = Some(unq(oldField))
        .filter(b => current.flatMap(nameOf).contains(b))
        .getOrElse(graft.tables.PartitionSpecParser
          .parse(Seq(sqlTransformToSpec(name, oldField)), cols, strict = true)
          .head.name)
      graft.tables.PartitionSpecParser.parse(Seq(newSpec), cols, strict = true)
      require(current.flatMap(nameOf).contains(oldName),
        s"ALTER TABLE graft.$name: no partition field '$oldName' to replace " +
          s"(spec: ${current.mkString(", ")})")
      tbl.updatePartitionSpec(current.map(s =>
        if (nameOf(s).contains(oldName)) newSpec else s))
    })
  }

  /** `ALTER TABLE graft.t SET IDENTIFIER FIELDS a, b` — re-key through
    * SQL ([[ManagedTable.setIdentifierFields]]; plain-data state gated
    * there: MoR artifacts scope on the old key).
    */
  def setIdentifierFieldsCommand(name: String, fields: String): LogicalPlan = {
    def t = ManagedTable.load(session, warehouse(name), name).getOrElse(
      throw new IllegalArgumentException(s"table graft.$name does not exist"))
    GraftDmlCommand("ALTER SET IDENTIFIER FIELDS", name, () => {
      val tbl = t
      val resolver = session.sessionState.analyzer.resolver
      val ids = fields.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { raw =>
        val id = raw.stripPrefix("`").stripSuffix("`")
        tbl.meta.schema.fields.find(f => resolver(f.name, id)).getOrElse(
          throw new IllegalArgumentException(
            s"ALTER TABLE graft.$name: identifier field '$id' is not a column")).name
      }
      tbl.setIdentifierFields(ids)
    })
  }

  /** `ALTER TABLE graft.t WRITE [LOCALLY] ORDERED BY c [ASC|DESC], …` /
    * `WRITE UNORDERED` — D5's SQL form: the order lands in the
    * `write.sort-order` property and replaces the default PK-ascending
    * within-partition write sort (no extra shuffle; file-level
    * clustering for manifest bounds + parquet row-group pruning).
    */
  def writeOrderedCommand(name: String, order: Option[String]): LogicalPlan = {
    def t = ManagedTable.load(session, warehouse(name), name).getOrElse(
      throw new IllegalArgumentException(s"table graft.$name does not exist"))
    GraftDmlCommand("ALTER WRITE ORDERED", name, () => {
      val tbl = t
      order match {
        case None => tbl.unsetProperties(Seq("write.sort-order"))
        case Some(o) =>
          val resolver = session.sessionState.analyzer.resolver
          val entries = o.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { tok =>
            val parts = tok.split("\\s+").toSeq
            require(parts.length <= 2,
              s"ALTER TABLE graft.$name WRITE ORDERED BY: cannot parse '$tok' " +
                "(expected `col [ASC|DESC]`; NULLS FIRST/LAST is not supported)")
            val id = parts.head.stripPrefix("`").stripSuffix("`")
            val colName = tbl.meta.schema.fields.find(f => resolver(f.name, id))
              .getOrElse(throw new IllegalArgumentException(
                s"ALTER TABLE graft.$name WRITE ORDERED BY: '$id' is not a column")).name
            val asc = parts.lift(1) match {
              case None => true
              case Some(d) if d.equalsIgnoreCase("asc")  => true
              case Some(d) if d.equalsIgnoreCase("desc") => false
              case Some(d) => throw new IllegalArgumentException(
                s"ALTER TABLE graft.$name WRITE ORDERED BY: expected ASC or " +
                  s"DESC after '$id', got '$d'")
            }
            s"$colName ${if (asc) "ASC" else "DESC"}"
          }
          require(entries.nonEmpty,
            s"ALTER TABLE graft.$name WRITE ORDERED BY: empty column list")
          tbl.setProperties(Map("write.sort-order" -> entries.mkString(",")))
      }
    })
  }

  private def procedureCommand(
      proc: String,
      rawArgs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal, NamedArgumentExpression}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.sql.Row
    // ONE spec declares every procedure (names, params, result schemas,
    // dispatch bodies) for BOTH seams — this parser seam and the V2
    // ProcedureCatalog ([[graft.catalog.GraftProcedures]]) render it
    val spec = ProcedureSpecs.byName.getOrElse(proc,
      throw new IllegalArgumentException(
        s"CALL graft.system.$proc: unknown procedure " +
          s"(have: ${ProcedureSpecs.names.mkString(", ")})"))
    // fold named arguments onto the declared positional slots — with the
    // standard procedure-call rules: no positional after named, no
    // duplicate/unknown names, no extra arguments
    val params = spec.params.map(_._1)
    val args: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
      require(params.isEmpty || rawArgs.length <= params.length,
        s"CALL graft.system.$proc: too many arguments " +
          s"(${rawArgs.length} given, takes ${params.mkString(", ")})")
      val slots = new Array[org.apache.spark.sql.catalyst.expressions.Expression](
        math.max(params.length, rawArgs.length))
      var pos = 0
      var sawNamed = false
      rawArgs.foreach {
        case NamedArgumentExpression(key, value) =>
          sawNamed = true
          val i = params.indexWhere(_.equalsIgnoreCase(key))
          require(i >= 0, s"CALL graft.system.$proc: unknown argument '$key' " +
            s"(have: ${params.mkString(", ")})")
          require(slots(i) == null,
            s"CALL graft.system.$proc: argument '$key' given twice")
          slots(i) = value
        case e =>
          require(!sawNamed,
            s"CALL graft.system.$proc: positional argument after a named one")
          require(slots(pos) == null,
            s"CALL graft.system.$proc: argument ${pos + 1} given twice")
          slots(pos) = e; pos += 1
      }
      slots.toSeq
    }
    def lit(i: Int): Any = args.lift(i) match {
      case Some(l: Literal) =>
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .convertToScala(l.value, l.dataType)
      case Some(null) | None => throw new IllegalArgumentException(
        s"CALL graft.system.$proc: missing argument " +
          params.lift(i).map(n => s"'$n'").getOrElse(s"${i + 1}"))
      case Some(other) => throw new IllegalArgumentException(
        s"CALL graft.system.$proc: arguments must be literals, got $other")
    }
    def str(i: Int): String = String.valueOf(lit(i))
    def lng(i: Int): Long = lit(i) match {
      case n: java.lang.Number      => n.longValue()
      case t: java.sql.Timestamp    => t.getTime
      case t: java.time.Instant     => t.toEpochMilli
      case other => throw new IllegalArgumentException(
        s"CALL graft.system.$proc: expected a numeric or timestamp argument, got $other")
    }
    def table(name: String): ManagedTable =
      ManagedTable.load(session, warehouse(name), name).getOrElse(
        throw new IllegalArgumentException(s"table graft.$name does not exist"))
    // spec boundary: String / Long, timestamps as epoch MILLIS (lng
    // already folds numeric and timestamp literals to millis)
    val argVals: Seq[Any] = spec.params.zipWithIndex.map {
      case ((_, StringType), i) => str(i)
      case ((_, _), i)          => lng(i)
    }
    GraftCallCommand(s"CALL ${spec.name}",
      String.valueOf(argVals(spec.displayArg)),
      spec.out.map { case (n, t) => AttributeReference(n, t, nullable = false)() },
      () => spec.run(session, table, argVals).map(vs => Row(vs: _*)))
  }

  /** `SHOW TABLES IN graft` — list the warehouse's managed tables
    * (directories holding a `meta.json`), optionally LIKE-filtered with
    * the usual `*`/`|` glob. Answered at the parser seam as a local
    * relation shaped by the statement's own output attributes.
    */
  private def showTables(st: org.apache.spark.sql.catalyst.plans.logical.ShowTables)
      : Option[LogicalPlan] = st.namespace match {
    case org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace(Seq(g), _)
        if g.equalsIgnoreCase("graft") =>
      session.conf.getOption("spark.graft.warehouse").map { wh =>
        val fs = graft.tables.TableMeta.fs(session.sparkContext.hadoopConfiguration, wh)
        val base = new org.apache.hadoop.fs.Path(wh)
        val names =
          (if (!fs.exists(base)) Seq.empty[String]
           else fs.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath.getName)
             .filter(n => fs.exists(new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(wh, n), "meta.json")))
          // distinct: a raced CREATE TABLE/VIEW can leave both objects
          // under one name (resolution prefers the table) — list it once
          ).++(graft.tables.ViewStore.list(session, wh)).distinct.sorted
        val kept = st.pattern match {
          case Some(p) =>
            // Spark's SHOW TABLES LIKE is case-insensitive glob
            val rx = "(?i)" + p.split('|').map(alt =>
              java.util.regex.Pattern.quote(alt).replace("*", "\\E.*\\Q")).mkString("|")
            names.filter(_.matches(rx))
          case None => names
        }
        import org.apache.spark.unsafe.types.UTF8String
        LocalRelation(st.output.map(_.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.AttributeReference]),
          kept.map(n => org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString("graft"), UTF8String.fromString(n), false)))
      }
    case _ => None
  }

  /** `SHOW PARTITIONS graft.t [PARTITION (k=v, …)]` — answered from the
    * manifest: live data tuples, one manifest read, ZERO data scan (the
    * Iceberg partitions-metadata-table answer; at 100 TB the difference
    * between milliseconds and a full listing). Output rows are Spark's
    * `k=v/k2=v2` strings in current-spec field order (old-epoch-only
    * keys trail, sorted). Filter keys must be identity partition
    * sources — bucket/truncate/date values are derived, so filtering on
    * them goes through `graft.t$partitions` where the tuple is a map.
    */
  private def showPartitions(sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions)
      : Option[LogicalPlan] = sp.child match {
    case u: UnresolvedTable
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          !u.multipartIdentifier(1).contains('$') =>
      val name = u.multipartIdentifier(1)
      session.conf.getOption("spark.graft.warehouse").flatMap { wh =>
        ManagedTable.load(session, wh, name).map { t =>
          val pf = graft.tables.PartitionSpecParser.parse(
            t.meta.partitionBy, t.meta.schema.fieldNames.toSet)
          require(pf.nonEmpty,
            s"SHOW PARTITIONS: graft.$name is not a partitioned table")
          val resolver = session.sessionState.analyzer.resolver
          val filter: Map[String, String] = sp.pattern match {
            case Some(org.apache.spark.sql.catalyst.analysis
                .UnresolvedPartitionSpec(m, _)) =>
              val keyed = m.toSeq.map { case (k, v) =>
                val f = pf.find(p =>
                    p.transform == "identity" && resolver(p.sourceColumn, k))
                  .getOrElse(throw new IllegalArgumentException(
                    s"SHOW PARTITIONS graft.$name: '$k' is not an identity " +
                      s"partition source (spec: ${t.meta.partitionBy.mkString(", ")}); " +
                      s"filter derived transforms via graft.$name$$partitions"))
                (f, v)
              }
              // canonicalize exactly like manifest tuples — typed cast,
              // then Spark's cast-to-string — in ONE job for all keys,
              // with ANSI cast failures wrapped precisely
              val canonRow =
                try session.range(1).select(keyed.map { case (f, v) =>
                  org.apache.spark.sql.functions.lit(v)
                    .cast(t.meta.schema(f.sourceColumn).dataType)
                    .cast(org.apache.spark.sql.types.StringType)
                }: _*).head()
                catch {
                  case e: org.apache.spark.SparkThrowable =>
                    throw new IllegalArgumentException(
                      s"SHOW PARTITIONS graft.$name: a PARTITION value does not " +
                        s"cast to its source column's type " +
                        s"(${keyed.map { case (f, v) => s"${f.sourceColumn}='$v'" }.mkString(", ")})",
                      e.asInstanceOf[Throwable])
                }
              keyed.zipWithIndex.map { case ((f, v), idx) =>
                require(!canonRow.isNullAt(idx),
                  s"SHOW PARTITIONS graft.$name: '$v' does not cast to " +
                    s"${f.sourceColumn}'s type " +
                    t.meta.schema(f.sourceColumn).dataType.simpleString)
                f.name -> canonRow.getString(idx)
              }.toMap
            case Some(other) => throw new IllegalArgumentException(
              s"SHOW PARTITIONS graft.$name: unsupported partition spec $other")
            case None => Map.empty
          }
          val order = pf.map(_.name).zipWithIndex.toMap
          val strs = t.partitionsMetadata().select("partition").collect()
            .map(_.getMap[String, String](0).toMap)
            .filter(tp => filter.forall { case (k, v) => tp.get(k).contains(v) })
            .map { tp =>
              val (inSpec, extra) = tp.toSeq.partition(kv => order.contains(kv._1))
              // escape through the same helper the path writer uses
              // (ManagedTable's getPartitionPathString staging): a value
              // containing '/' or '=' must not yield an ambiguous row —
              // this matches Spark/Hive SHOW PARTITIONS output exactly
              (inSpec.sortBy(kv => order(kv._1)) ++ extra.sortBy(_._1))
                .map { case (k, v) =>
                  org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                    .getPartitionPathString(k, v)
                }.mkString("/")
            }.distinct.sorted.toIndexedSeq
          import org.apache.spark.unsafe.types.UTF8String
          LocalRelation(sp.output.map(_.asInstanceOf[
            org.apache.spark.sql.catalyst.expressions.AttributeReference]),
            strs.map(s => org.apache.spark.sql.catalyst.InternalRow(
              UTF8String.fromString(s)))): LogicalPlan
        }.orElse {
          if (graft.tables.ViewStore.exists(session, wh, name))
            throw new IllegalArgumentException(
              s"SHOW PARTITIONS: graft.$name is a view — views have no partitions")
          else None
        }
      }
    case _ => None
  }

  /** `SHOW CREATE TABLE graft.t` — a statement that, re-executed against
    * an empty warehouse, recreates an equivalent table (schema,
    * partition spec, identifier fields, user properties). Internal
    * bookkeeping properties (rename lineage, spec history, barriers,
    * branch pins) are excluded: they describe table HISTORY, not its
    * definition, and replaying them onto a fresh table would corrupt it.
    */
  private def showCreateTable(sc: org.apache.spark.sql.catalyst.plans.logical.ShowCreateTable)
      : Option[LogicalPlan] = sc.child match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          !u.multipartIdentifier(1).contains('$') =>
      session.conf.getOption("spark.graft.warehouse").flatMap { wh =>
        val name = u.multipartIdentifier(1)
        def out(stmt: String): LogicalPlan = {
          import org.apache.spark.unsafe.types.UTF8String
          LocalRelation(sc.output.map(_.asInstanceOf[
            org.apache.spark.sql.catalyst.expressions.AttributeReference]),
            Seq(org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(stmt))))
        }
        ManagedTable.load(session, wh, name).map { t =>
          val m = t.meta
          val cols = m.schema.fields
            .map(f => s"  ${quoteIfNeeded(f.name)} ${f.dataType.sql}" +
              (if (f.nullable) "" else " NOT NULL"))
            .mkString(",\n")
          // stored spec grammar is `bucket(col,N)`/`truncate(col,W)`;
          // Spark's DDL transform grammar requires the parameter FIRST,
          // and column identifiers must re-quote
          val ParamTransform = """(bucket|truncate)\((.+),(\d+)\)""".r
          val TimeTransform = """(year|month|day|hour)\((.+)\)""".r
          val ddlSpec = m.partitionBy.map {
            case ParamTransform(fn, c, n) => s"$fn($n, ${quoteIfNeeded(c)})"
            case TimeTransform(fn, c)     => s"$fn(${quoteIfNeeded(c)})"
            case identityCol              => quoteIfNeeded(identityCol)
          }
          val partClause =
            if (ddlSpec.isEmpty) ""
            else s"\nPARTITIONED BY (${ddlSpec.mkString(", ")})"
          val internalPrefixes = Seq(
            ManagedTable.TagPrefix, ManagedTable.BranchPrefix,
            ManagedTable.RenamedPrefix, ManagedTable.DefaultPrefix,
            ManagedTable.DroppedPrefix, ManagedTable.SpecHistoryKey,
            ManagedTable.BarrierKey,
            // bare key AND dot-suffixed variants (nullkey/expect/per-table)
            graft.streaming.CdcPipeline.CdcBatchIdProp,
            // progress markers (round 9): replaying exactly-once /
            // refresh bookkeeping onto a fresh table would corrupt it —
            // a restarted stream's batch 0 hits a marker-ahead refusal,
            // a replica skips upstream versions it never applied
            "sink.last-batch-id.",
            "ingest.last-batch-id",
            graft.streaming.StreamingAgg.BatchIdProp,
            "replication.applied-upto.",
            graft.tables.MaterializedView.VersionKey)
          val userProps = m.properties.filterNot { case (k, _) =>
            internalPrefixes.exists(k.startsWith)
          }
          val props = (if (m.identifierFields.nonEmpty)
            Seq(IdsProp -> m.identifierFields.mkString(",")) else Seq.empty) ++
            userProps.toSeq.sortBy(_._1)
          val propClause =
            if (props.isEmpty) ""
            else "\nTBLPROPERTIES (" + props.map { case (k, v) =>
              s"'${k.replace("'", "''")}'='${v.replace("'", "''")}'"
            }.mkString(",\n  ") + ")"
          out(s"CREATE TABLE graft.$name (\n$cols)$partClause$propClause\n")
        }.orElse {
          // views round-trip too: the definition IS the stored SQL text
          graft.tables.ViewStore.load(session, wh, name)
            .map(sql => out(s"CREATE VIEW graft.$name AS\n$sql\n"))
        }
      }
    case _ => None
  }

  private def quoteIfNeeded(n: String): String =
    if (n.matches("[a-zA-Z_][a-zA-Z0-9_]*")) n else s"`${n.replace("`", "``")}`"

  /** The `graft.<name>` identifier behind an ALTER VIEW target — the
    * parser wraps it as UnresolvedView (or UnresolvedIdentifier on some
    * statement shapes).
    */
  private def graftViewIdent(p: LogicalPlan): Option[String] = p match {
    case UnresolvedIdentifier(Seq(g, n), _) if g.equalsIgnoreCase("graft") => Some(n)
    case v: org.apache.spark.sql.catalyst.analysis.UnresolvedView
        if v.multipartIdentifier.length == 2 &&
          v.multipartIdentifier.head.equalsIgnoreCase("graft") =>
      Some(v.multipartIdentifier(1))
    case _ => None
  }

  /** `DESCRIBE [EXTENDED] graft.t` — columns, partitioning, and (under
    * EXTENDED) identifier fields + table properties, shaped by the
    * statement's own output attributes.
    */
  private def describeTable(d: org.apache.spark.sql.catalyst.plans.logical.DescribeRelation)
      : Option[LogicalPlan] = d.relation match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          !u.multipartIdentifier(1).contains('$') =>
      session.conf.getOption("spark.graft.warehouse").flatMap { wh =>
        import org.apache.spark.unsafe.types.UTF8String
        def row(a: String, b: String, c: String) =
          org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(a), UTF8String.fromString(b),
            if (c == null) null else UTF8String.fromString(c))
        def shaped(rows: Seq[org.apache.spark.sql.catalyst.InternalRow]) =
          LocalRelation(d.output.map(_.asInstanceOf[
            org.apache.spark.sql.catalyst.expressions.AttributeReference]), rows)
        ManagedTable.load(session, wh, u.multipartIdentifier(1)).map { t =>
          require(d.partitionSpec.isEmpty,
            s"DESCRIBE ... PARTITION is not supported for graft tables " +
              s"(query graft.${u.multipartIdentifier(1)}$$partitions instead)")
          val cols = t.meta.schema.fields.toSeq.map(f =>
            row(f.name, f.dataType.simpleString, null))
          val parts =
            if (t.meta.partitionBy.forall(_.trim.isEmpty)) Seq.empty
            else row("# Partitioning", "", null) +:
              t.meta.partitionBy.zipWithIndex.map { case (p, i) =>
                row(s"Part $i", p, null)
              }
          val detail =
            if (!d.isExtended) Seq.empty
            else row("# Detailed Table Information", "", null) +:
              (row("Identifier Fields", t.meta.identifierFields.mkString(", "), null) +:
                t.meta.properties.toSeq.sortBy(_._1).map { case (k, v) =>
                  row(k, v, null)
                })
          shaped(cols ++ parts ++ detail)
        }.orElse {
          // DESCRIBE on a persisted view: the body's CURRENT resolved
          // schema (re-analyzed, like every reference), plus the stored
          // SQL text under EXTENDED
          graft.tables.ViewStore.load(session, wh, u.multipartIdentifier(1)).map { sql =>
            val schema = org.apache.spark.sql.graftbridge.GraftBridge
              .dataFrame(session, session.sessionState.sqlParser.parsePlan(sql)).schema
            val cols = schema.fields.toSeq.map(f =>
              row(f.name, f.dataType.simpleString, null))
            val detail =
              if (!d.isExtended) Seq.empty
              else Seq(row("# Detailed View Information", "", null),
                row("Type", "VIEW", null), row("View Text", sql, null))
            shaped(cols ++ detail)
          }
        }
      }
    case _ => None
  }

  /** A plan a manifest aggregate may answer over: (table name, pinned
    * ref) — the bare `graft.t` relation (ref None) or `graft.t VERSION
    * AS OF <snapshot-or-tag>` over it (round 10; timestamps and branch
    * refs fall through — the former need version resolution the scan
    * already does, the latter are staged views only the scan sees).
    */
  private object GraftAggSource {
    def unapply(p: LogicalPlan): Option[(String, Option[String])] = {
      def nameOf(r: LogicalPlan): Option[String] = r match {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
            if u.multipartIdentifier.length == 2 &&
              u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
              !u.multipartIdentifier(1).contains('$') =>
          Some(u.multipartIdentifier(1))
        case _ => None
      }
      p match {
        case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel
            if tt.timestamp.isEmpty && tt.version.exists(_.nonEmpty) =>
          nameOf(tt.relation).map(_ -> tt.version)
        case other => nameOf(other).map(_ -> None)
      }
    }
  }

  /** A manifest-answerable single aggregate: count(*), min(col), or
    * max(col). (kind, column, output name). */
  private def manifestAggOf(proj: org.apache.spark.sql.catalyst.expressions.NamedExpression)
      : Option[(String, Option[String], String)] = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
    import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
    def parse(e: Expression): Option[(String, Option[String], String)] = e match {
      case UnresolvedFunction(Seq(fn), args, false, None, false, Nil, false) =>
        (fn.toLowerCase, args) match {
          case ("count", Seq(Literal(1, _)))     => Some(("count", None, "count(1)"))
          case ("count", Seq(_: UnresolvedStar)) => Some(("count", None, "count(1)"))
          case ("min", Seq(a: UnresolvedAttribute)) if a.nameParts.length == 1 =>
            Some(("min", Some(a.nameParts.head), s"min(${a.nameParts.head})"))
          case ("max", Seq(a: UnresolvedAttribute)) if a.nameParts.length == 1 =>
            Some(("max", Some(a.nameParts.head), s"max(${a.nameParts.head})"))
          case _ => None
        }
      case _ => None
    }
    proj match {
      case a @ Alias(child, _)       => parse(child).map { case (k, c, _) => (k, c, a.name) }
      case UnresolvedAlias(child, _) => parse(child)
      case _                         => None
    }
  }

  /** The GROUP-BY-partition-source form of [[manifestAnswer]]: every
    * output must be one of the grouping attributes (pass-through) or a
    * manifest-answerable aggregate ([[manifestAggOf]]); one row per live
    * tuple combination. Unresolvable shapes fall through to the real
    * plan.
    */
  private def groupedManifestAnswer(
      agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate,
      name: String, ref: Option[String] = None): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute}
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Literal}
    val gNames = agg.groupingExpressions
      .map(_.asInstanceOf[UnresolvedAttribute].nameParts.head)
    if (gNames.map(_.toLowerCase(java.util.Locale.ROOT)).distinct.length !=
        gNames.length) return None
    def gIdx(parts: Seq[String]): Option[Int] =
      if (parts.length != 1) None
      else Some(gNames.indexWhere(_.equalsIgnoreCase(parts.head))).filter(_ >= 0)
    session.conf.getOption("spark.graft.warehouse")
      .flatMap(wh => ManagedTable.load(session, wh, name))
      // same wap-branch fall-through as the bare-aggregate case: the
      // manifest answer reads LIVE and must not disagree with SELECT *
      // (explicit ref reads are unaffected by wap)
      .filterNot(t => ref.isEmpty && session.conf.getOption("spark.wap.branch")
        .filter(_.nonEmpty).exists(t.branches().contains))
      .flatMap { t =>
        def fieldOf(n: String) =
          t.meta.schema.fields.find(_.name.equalsIgnoreCase(n))
        // Left((groupIdx, outputName)) = grouping passthrough; Right(want)
        val outs = agg.aggregateExpressions.map {
          case a: UnresolvedAttribute =>
            gIdx(a.nameParts).map(i => Left((i, a.nameParts.head)))
          case al @ Alias(a: UnresolvedAttribute, _) =>
            gIdx(a.nameParts).map(i => Left((i, al.name)))
          case UnresolvedAlias(a: UnresolvedAttribute, _) =>
            gIdx(a.nameParts).map(i => Left((i, a.nameParts.head)))
          case e => manifestAggOf(e).map(Right(_))
        }
        if (!outs.forall(_.isDefined)) None
        else {
          val flat = outs.map(_.get)
          val wants = flat.collect { case Right((k, c, _)) => (k, c) }
          val wantFields = wants.map { case (_, c) => c.map(fieldOf) }
          val gFields = gNames.map(fieldOf)
          if (wantFields.exists(_.exists(_.isEmpty)) || gFields.exists(_.isEmpty)) None
          else {
            val gfs = gFields.map(_.get)
            val resolved = wants.zip(wantFields).map { case ((k, _), f) =>
              (k, f.flatten.map(_.name))
            }
            t.manifestGroupedAgg(gfs.map(_.name), resolved, ref).map { rows =>
              val tz = session.sessionState.conf.sessionLocalTimeZone
              val attrs = flat.map {
                case Left((i, n)) =>
                  AttributeReference(n, gfs(i).dataType, nullable = true)()
                case Right(("count", _, n)) =>
                  AttributeReference(n, org.apache.spark.sql.types.LongType,
                    nullable = false)()
                case Right((_, Some(c), n)) =>
                  AttributeReference(n, fieldOf(c).get.dataType, nullable = true)()
                case Right((k, None, n)) => // unreachable: min/max carry a column
                  AttributeReference(n, org.apache.spark.sql.types.LongType)()
              }
              val data = rows.map { case (tuple, vals) =>
                val gVals = tuple.zip(gfs).map { case (s, gf) =>
                  s.map(v => Cast(Literal(v), gf.dataType, Some(tz)).eval(null)).orNull
                }
                var i = -1
                InternalRow.fromSeq(flat.map {
                  case Left((gi, _)) => gVals(gi)
                  case Right(("count", _, _)) => i += 1; vals(i)
                  case Right((_, Some(c), _)) =>
                    i += 1
                    ManifestAggOnV1.statsToColumn(vals(i), fieldOf(c).get.dataType, session)
                  case Right(_) => i += 1; vals(i)
                })
              }
              LocalRelation(attrs, data)
            }
          }
        }
      }
  }

  /** One LocalRelation row answering EVERY aggregate in the project list
    * (round 10: multi-aggregate SELECTs fold in one statement); None if
    * any single cell is not exactly answerable.
    */
  private def manifestAnswer(t: ManagedTable,
                             aggs: Seq[(String, Option[String], String)],
                             ref: Option[String] = None): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val cells = aggs.map {
      case ("count", _, name) => t.fastRowCount(ref).map { n =>
        (AttributeReference(name, org.apache.spark.sql.types.LongType,
          nullable = false)(), n: Any)
      }
      case (kind, Some(colName), name) =>
        t.meta.schema.fields.find(_.name.equalsIgnoreCase(colName)).flatMap { fld =>
          t.manifestColExtreme(fld.name, wantMin = kind == "min", ref).map { raw =>
            // stats domain → the column's type (shared with the V1 plan
            // rule so both spellings materialize identically)
            (AttributeReference(name, fld.dataType, nullable = true)(),
              ManifestAggOnV1.statsToColumn(raw, fld.dataType, session))
          }
        }
      case _ => None
    }
    if (cells.exists(_.isEmpty)) None
    else Some(LocalRelation(cells.map(_.get._1),
      Seq(InternalRow.fromSeq(cells.map(_.get._2)))))
  }

  /** SQL time travel — the grammar-level spelling of the `graft.t$v<N>`
    * identifier suffix and [[ManagedTable.readAsOf]]. Handled at the
    * parser seam like the DDL: built-in relation resolution fails hard on
    * a time-travel over an uncataloged identifier before extension rules
    * would see it.
    *
    * `VERSION AS OF` accepts a snapshot number, a TAG name, or a WAP
    * BRANCH name (round 8, matching Iceberg's ref resolution in time
    * travel): a non-numeric version string resolves through
    * [[ManagedTable.tags]] first (tags are immutable pins — the
    * reproducibility use), then [[ManagedTable.branches]] (the staged
    * audit view), and an unknown ref fails with the live ref names
    * rather than Spark's generic unresolved-relation error.
    */
  private def timeTravel(tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel)
      : Option[LogicalPlan] = tt.relation match {
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
        if u.multipartIdentifier.length == 2 &&
          u.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          !u.multipartIdentifier(1).contains('$') =>
      session.conf.getOption("spark.graft.warehouse")
        .flatMap(wh => ManagedTable.load(session, wh, u.multipartIdentifier(1)))
        .flatMap { t =>
          val df = (tt.version, tt.timestamp) match {
            case (Some(v), _) if v.nonEmpty => Some(t.readRef(v))
            case (None, Some(e)) if e.foldable =>
              val micros = org.apache.spark.sql.catalyst.expressions.Cast(
                e, org.apache.spark.sql.types.TimestampType,
                Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null)
              Option(micros).map(m => t.readAsOf(m.asInstanceOf[Long] / 1000L))
            case _ => None
          }
          df.map(_.queryExecution.analyzed)
        }
    case _ => None
  }

  private object GraftAlterTarget {
    def unapply(p: LogicalPlan): Option[String] = p match {
      case ut: UnresolvedTable if ut.multipartIdentifier.length == 2 &&
          ut.multipartIdentifier.head.equalsIgnoreCase("graft") &&
          !ut.multipartIdentifier(1).contains('$') =>
        Some(ut.multipartIdentifier(1))
      case _ => None
    }
  }

  /** ALTERs need the table to exist at analysis; unknown tables keep the
    * original node so Spark raises its normal error.
    */
  private def withTable(orig: LogicalPlan, name: String)(
      f: ManagedTable => LogicalPlan): LogicalPlan =
    session.conf.getOption("spark.graft.warehouse")
      .flatMap(wh => ManagedTable.load(session, wh, name))
      .map(f).getOrElse(orig)

  private def warehouse(name: String): String =
    session.conf.getOption("spark.graft.warehouse").getOrElse(
      throw new IllegalArgumentException(
        s"graft.$name: set spark.graft.warehouse before DDL"))

  private def ref(r: NamedReference, name: String): String = {
    require(r.fieldNames.length == 1,
      s"graft.$name: nested partition source ${r.describe} is not supported")
    r.fieldNames.head
  }

  /** V2 transform → the spec grammar string the strict parser validates.
    * Matched through the public `Transform` interface (the case classes
    * are `private[sql]`).
    */
  private def transformToSpec(name: String, t: Transform): String = {
    val refs = t.references.toSeq.map(ref(_, name))
    val lits = t.arguments.toSeq.collect {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        String.valueOf(l.value)
    }
    t.name.toLowerCase match {
      case "identity" =>
        require(refs.length == 1, s"graft.$name: identity takes one column")
        refs.head
      case "years" | "year"   => s"year(${refs.head})"
      case "months" | "month" => s"month(${refs.head})"
      case "days" | "day"     => s"day(${refs.head})"
      case "hours" | "hour"   => s"hour(${refs.head})"
      case "bucket" =>
        require(refs.length == 1 && lits.length == 1,
          s"graft.$name: bucket takes (N, column)")
        s"bucket(${refs.head},${lits.head})"
      case "truncate" =>
        require(refs.length == 1 && lits.length == 1,
          s"graft.$name: truncate takes (W, column)")
        s"truncate(${refs.head},${lits.head})"
      case other => throw new IllegalArgumentException(
        s"graft.$name: unsupported partition transform '$other'")
    }
  }
}
