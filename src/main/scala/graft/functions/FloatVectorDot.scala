package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `array<float>` embedding columns, accumulated in
  * double — the hot scalar of the similarity/near-dup family.
  *
  * The functions-API formulation (`aggregate(zip_with(...))`) evaluates
  * per-element interpreted lambdas with boxing; this expression is a tight
  * codegen'd loop over the primitive float arrays (~100× less per-element
  * overhead at 64 dims × millions of candidate pairs). Summation order is
  * sequential, matching DuckDB's `list_dot_product` bit-for-bit so
  * round(6) cosine outputs stay oracle-comparable.
  *
  * Mismatched lengths score over the common prefix; null input array →
  * null (nullSafeEval semantics); a null ELEMENT in the common prefix →
  * null result, matching the `aggregate(zip_with(...))` formulation and
  * DuckDB's `list_dot_product` (reading the slot as 0.0 would silently
  * diverge from the oracle). The null scan is a separate primitive pass
  * so the non-null fast path stays allocation-free.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"float_vector_dot expects two array<float> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (FloatVectorDot.hasNullElement(x, y)) null
    else java.lang.Double.valueOf(FloatVectorDot.dot(x, y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FloatVectorDot.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($cls.hasNullElement($a, $b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $cls.dot($a, $b);
         |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vector_dot"
}

object FloatVectorDot {
  /** Any null element in the common prefix? (bit-test pass, no boxing) */
  def hasNullElement(x: ArrayData, y: ArrayData): Boolean = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Shared by interpreted eval and generated code. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
