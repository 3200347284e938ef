package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as a native codegen expression — the
  * canonicalization step every dedup/fingerprint pipeline needs before
  * hashing (two byte-different encodings of "café" must collapse to one
  * fingerprint, or exact dedup silently misses real duplicates). Spark has
  * no built-in Unicode-normalize function; a Scala UDF would drop the
  * whole downstream projection out of whole-stage codegen on the hottest
  * map-only stage of a corpus pipeline, so this follows the
  * [[DecimalFromBytes]] pattern: `doGenCode` calls one static helper and
  * the expression stays inside the generated loop.
  *
  * `form` ∈ NFC | NFD | NFKC | NFKD (java.text.Normalizer semantics, which
  * match DuckDB's `nfc_normalize` — the oracle seam) plus the pipeline
  * composite STRIP_ACCENTS: NFD, drop combining marks (\p{Mn}) —
  * equivalent to DuckDB's `strip_accents`.
  */
case class TextNormalize(child: Expression, form: String) extends UnaryExpression {
  TextNormalize.require(form)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_normalize expects STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TextNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextNormalize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"""$cls.normalize($c, "$form")""")
  }

  override protected def withNewChildInternal(newChild: Expression): TextNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object TextNormalize {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD", "STRIP_ACCENTS")

  private[functions] def require(form: String): Unit =
    if (!Forms.contains(form))
      throw new IllegalArgumentException(
        s"graft_normalize form must be one of ${Forms.mkString(", ")}, got '$form'")

  // Precompiled: the codegen'd hot loop must not recompile a regex per row.
  private val CombiningMarks = java.util.regex.Pattern.compile("\\p{Mn}+")

  /** Shared by interpreted eval and generated code. ASCII fast path: all
    * five forms are identity on pure-ASCII input (the overwhelmingly
    * common case in web corpora), and `numBytes == numChars` detects it
    * without materializing a java.lang.String.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    if (s == null) return null
    if (s.numBytes == s.numChars) return s // pure ASCII: identity under all forms
    val str = s.toString
    val out = form match {
      case "STRIP_ACCENTS" =>
        CombiningMarks.matcher(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)).replaceAll("")
      case f =>
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.valueOf(f))
    }
    if (out == str) s else UTF8String.fromString(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TextNormalize].getName, "graft_normalize")
}
