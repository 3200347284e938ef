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
  * Mismatched lengths score over the common prefix; null input → null
  * (nullSafeEval semantics).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
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
    FloatVectorDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FloatVectorDot.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.dot($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "float_vector_dot"
}

object FloatVectorDot {
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
