package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** D4 — Iceberg-style partition-by spec strings → derived partition columns.
  *
  * Same grammar as the reference's parser (`(\w+)\((.+)\)`,
  * SINK/IcebergUtil.java:60,214-305): bare column = identity,
  * `year|month|day|hour(col)`, `bucket(col,N)`, `truncate(col,W)`.
  * Missing source columns are skipped in lenient mode or rejected in strict
  * mode (SINK/IcebergConfig.java:114-132).
  *
  * Derived column naming follows Iceberg's convention (`col_year`,
  * `col_bucket`, ...). The physical layout is Hive-style `k=v` directories,
  * so partition pruning on these columns is free for every reader.
  */
final case class PartitionField(
    sourceColumn: String,
    transform: String,
    name: String,
    expr: Column
)

object PartitionSpecParser {

  private val FnPattern = """^(\w+)\((.+)\)$""".r

  /** Parse a comma-separated spec against the available columns.
    * @param strict error on references to absent columns (vs. skip)
    */
  def parse(spec: Seq[String], columns: Set[String], strict: Boolean = false): Seq[PartitionField] =
    spec.map(_.trim).filter(_.nonEmpty).flatMap { s =>
      val pf = s match {
        case FnPattern(fn, argsRaw) =>
          val args = argsRaw.split(",").map(_.trim).toSeq
          fn.toLowerCase match {
            case "identity" => identityField(args.head)
            case "year"  => PartitionField(args.head, "year", s"${args.head}_year", year(col(args.head)))
            case "month" => PartitionField(args.head, "month", s"${args.head}_month",
              date_format(col(args.head), "yyyy-MM"))
            case "day"   => PartitionField(args.head, "day", s"${args.head}_day",
              date_format(col(args.head), "yyyy-MM-dd"))
            case "hour"  => PartitionField(args.head, "hour", s"${args.head}_hour",
              date_format(col(args.head), "yyyy-MM-dd-HH"))
            case "bucket" =>
              val (c, n) = numericArg(args, s)
              PartitionField(c, "bucket", s"${c}_bucket", pmod(hash(col(c)), lit(n)))
            case "truncate" =>
              val (c, w) = numericArg(args, s)
              PartitionField(c, "truncate", s"${c}_trunc", substring(col(c), 1, w))
            case other =>
              throw new IllegalArgumentException(s"unknown partition transform '$other' in '$s'")
          }
        case bare => identityField(bare)
      }
      if (columns.contains(pf.sourceColumn)) Some(pf)
      else if (strict) throw new IllegalArgumentException(
        s"partition column '${pf.sourceColumn}' not in schema (${columns.mkString(",")})")
      else None
    }

  private def identityField(c: String): PartitionField =
    PartitionField(c, "identity", c, col(c))

  /** Accept both `bucket(col, N)` and `bucket(N, col)` argument orders. */
  private def numericArg(args: Seq[String], raw: String): (String, Int) = {
    require(args.length == 2, s"transform needs 2 args: '$raw'")
    args.head.toIntOption match {
      case Some(n) => (args(1), n)
      case None => (args.head, args(1).toIntOption.getOrElse(
        throw new IllegalArgumentException(s"no numeric arg in '$raw'")))
    }
  }
}
