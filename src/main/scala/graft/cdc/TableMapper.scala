package graft.cdc

/** R6 — destination (topic/table) name → target table name.
  *
  * Same observable rules as the reference's DefaultIcebergTableMapper
  * (SINK/mapper/DefaultIcebergTableMapper.java:17-35; naming doc
  * docs/iceberg.md:132-146): optional regex rewrite, dots → underscores,
  * configurable prefix and case folding. Pluggable like the reference's
  * CDI-injected IcebergTableMapper (SINK/mapper/IcebergTableMapper.java:5-7).
  */
trait TableMapper extends Serializable {
  def map(destination: String): String
}

final case class DefaultTableMapper(
    prefix: String = "",
    replaceRegex: Option[(String, String)] = None,
    lowercase: Boolean = true
) extends TableMapper {
  override def map(destination: String): String = {
    val rewritten = replaceRegex
      .map { case (re, sub) => destination.replaceAll(re, sub) }
      .getOrElse(destination)
    val flat = prefix + rewritten.replace(".", "_").replace("-", "_")
    if (lowercase) flat.toLowerCase else flat
  }

  /** The same mapping as a native column expression — used when the
    * destination is data (a column of a batch) rather than routing
    * metadata; stays inside whole-stage codegen, no UDF.
    */
  def mapColumn(destination: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val rewritten = replaceRegex
      .map { case (re, sub) => regexp_replace(destination, re, sub) }
      .getOrElse(destination)
    val flat = concat(lit(prefix),
      translate(rewritten, ".-", "__"))
    if (lowercase) lower(flat) else flat
  }
}
