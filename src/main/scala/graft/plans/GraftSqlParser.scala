package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating parser that rewrites graft DDL statements straight after
  * parse. DDL has to be intercepted HERE rather than in a resolution
  * rule: the analyzer's built-in session-catalog resolution runs before
  * extension rules within the resolution batch and rejects e.g. a
  * `day(ts)` partition transform on a v1 catalog identifier before a
  * rule could claim the statement. Reads and DML stay in
  * [[ResolveGraftTables]] (they only involve relations, which built-in
  * rules leave unresolved for extensions).
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private lazy val ddl = new ResolveGraftDdl(session)

  /** Snapshot-ref DDL (round 8) — `ALTER TABLE graft.t CREATE|DROP
    * BRANCH|TAG name [AS OF VERSION n]`, the Iceberg ref-management
    * grammar. Spark's own parser has no production for these (Iceberg
    * ships them in its extension grammar), so they are recognized from
    * the SQL TEXT before delegating — the delegate would raise a parse
    * error, not an unresolved plan a rule could claim.
    */
  private val RefDdl =
    ("""(?is)^\s*ALTER\s+TABLE\s+graft\s*\.\s*`?([A-Za-z0-9_]+)`?\s+""" +
      """(CREATE|DROP)\s+(BRANCH|TAG)\s+`?([A-Za-z0-9_][A-Za-z0-9_.\-]*)`?""" +
      """(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*$""").r

  /** Table-management DDL (round 10) — the Iceberg Spark-extension
    * grammar for partition-spec evolution, identifier fields and write
    * order, none of which Spark's own parser has a production for:
    *   ALTER TABLE graft.t ADD PARTITION FIELD <transform>
    *   ALTER TABLE graft.t DROP PARTITION FIELD <transform>
    *   ALTER TABLE graft.t REPLACE PARTITION FIELD <old> WITH <new>
    *   ALTER TABLE graft.t SET IDENTIFIER FIELDS a, b
    *   ALTER TABLE graft.t WRITE [LOCALLY] ORDERED BY a [ASC|DESC], b
    *   ALTER TABLE graft.t WRITE UNORDERED
    */
  private val AlterHead = """(?is)^\s*ALTER\s+TABLE\s+graft\s*\.\s*`?([A-Za-z0-9_]+)`?\s+"""
  private val PartitionFieldDdl =
    (AlterHead + """(ADD|DROP)\s+PARTITION\s+FIELD\s+(.+?)\s*;?\s*$""").r
  private val ReplacePartitionFieldDdl =
    (AlterHead + """REPLACE\s+PARTITION\s+FIELD\s+(.+?)\s+WITH\s+(.+?)\s*;?\s*$""").r
  private val SetIdentifierFieldsDdl =
    (AlterHead + """SET\s+IDENTIFIER\s+FIELDS\s+(.+?)\s*;?\s*$""").r
  private val WriteOrderedDdl =
    (AlterHead + """WRITE\s+(?:LOCALLY\s+)?ORDERED\s+BY\s+(.+?)\s*;?\s*$""").r
  private val WriteUnorderedDdl =
    (AlterHead + """WRITE\s+UNORDERED\s*;?\s*$""").r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case RefDdl(tbl, verb, kind, ref, ver) =>
      ddl.refDdlCommand(tbl, verb.toUpperCase(java.util.Locale.ROOT),
        kind.toUpperCase(java.util.Locale.ROOT), ref, Option(ver).map(_.toLong))
    case ReplacePartitionFieldDdl(tbl, oldF, newF) =>
      ddl.replacePartitionFieldCommand(tbl, oldF, newF)
    case PartitionFieldDdl(tbl, verb, field) =>
      ddl.partitionFieldCommand(tbl,
        verb.toUpperCase(java.util.Locale.ROOT), field)
    case SetIdentifierFieldsDdl(tbl, fields) =>
      ddl.setIdentifierFieldsCommand(tbl, fields)
    case WriteOrderedDdl(tbl, order) => ddl.writeOrderedCommand(tbl, Some(order))
    case WriteUnorderedDdl(tbl)      => ddl.writeOrderedCommand(tbl, None)
    case _ => ddl(delegate.parsePlan(sqlText))
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
