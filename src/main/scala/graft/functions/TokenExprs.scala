package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenization: `filter(split(lower(text), "\\s+"),
  * t => length(t) > 0)` as ONE codegen'd pass over the UTF-8 bytes.
  *
  * The declarative formulation is correct but interpreted: Spark's
  * higher-order functions (`filter`, `transform`, `aggregate`) are
  * CodegenFallback expressions evaluated per-element with boxed lambda
  * dispatch — measured ~10-20µs per element, which makes TOKENIZATION the
  * dominant cost of every text query at corpus scale. This expression
  * lowers once (`UTF8String.toLowerCase`, identical to `lower()`) and
  * scans bytes splitting on Java-regex `\s` = [ \t\n\x0B\f\r] — all
  * single-byte values, which in UTF-8 never occur inside a multi-byte
  * sequence, so the byte scan is exact for any unicode input.
  */
case class GraftTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    GraftTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftTokens.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.tokens($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)

  override def prettyName: String = "graft_tokens_native"
}

object GraftTokens {
  private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Shared by interpreted eval and generated code. */
  def tokens(s: UTF8String): ArrayData = {
    val lowered = s.toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new GenericArrayData(out.toArray)
  }
}

/** Word n-grams over a token array, space-joined — the shingling kernel:
  * `transform(sequence(1, size-n+1), i => array_join(slice(toks, i, n),
  * " "))` as one codegen'd loop. Fewer than `n` tokens → empty array
  * (never null), like the guarded declarative form. Null elements are
  * skipped in the join (array_join semantics). The interpreted
  * slice+join lambda chain this replaces was the measured dominant cost
  * of the n-gram model/score pipelines (~20µs per shingle).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams expects array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WordNgrams.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.ngrams($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) {
        window(j) = if (arr.isNullAt(i + j)) null
                    else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
