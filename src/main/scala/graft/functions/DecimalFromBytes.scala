package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, Decimal, DecimalType}

/** Native Catalyst expression for Debezium precise-mode decimals: unscaled
  * big-endian two's-complement bytes + a fixed scale → `Decimal(p, s)`
  * (reference semantics: SINK/converter/AbstractEventConverter.java:86-104,
  * SINK/converter/JsonEventConverter.java:256-292).
  *
  * This is the one conversion in the layer with no built-in equivalent
  * (SURVEY §7.3). As an `Expression` with `doGenCode` it stays inside
  * whole-stage codegen — no UDF serialization, no Option boxing, null-safe
  * for free via `nullSafeCodeGen`.
  */
case class DecimalFromBytes(child: Expression, precision: Int, scale: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"decimal_from_bytes expects BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = DecimalType(precision, scale)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    DecimalFromBytes.decode(bytes, precision, scale)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = DecimalFromBytes.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.decode($c, $precision, $scale)")
  }

  override protected def withNewChildInternal(newChild: Expression): DecimalFromBytes =
    copy(child = newChild)

  override def prettyName: String = "decimal_from_bytes"
}

object DecimalFromBytes {
  /** Shared by interpreted eval and generated code. */
  def decode(bytes: Array[Byte], precision: Int, scale: Int): Decimal = {
    if (bytes == null) return null
    val bd = new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
    Decimal(bd, precision, scale)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DecimalFromBytes].getName, "decimal_from_bytes")
}
