package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance if it is ≤ `threshold`, else -1 — the hot
  * comparator of blocked entity resolution, where almost every candidate
  * pair is compared and almost none match.
  *
  * Semantics: identical to `levenshtein(a, b)` (code-point edits) whenever
  * the true distance is within the threshold, so `dist >= 0` filters
  * exactly like `levenshtein(a, b) <= k` while computing a fraction of the
  * work:
  *
  *  1. common prefix and suffix are stripped first — O(len) — which for
  *     near-duplicate keys (IDs, names, URLs sharing long runs) shrinks
  *     the DP to the differing middle;
  *  2. the remaining DP is banded to 2k+1 cells per row (a cell farther
  *     than k off-diagonal can never reach back under k), with early exit
  *     the first time a whole band row exceeds k.
  *
  * Cost is O(len + k·min(n,m)) instead of O(n·m): at k=2 over 18-char
  * strings sharing a 13-char prefix that is ~20 DP cells instead of 324.
  * Codegen'd like [[FloatVectorDot]]; null inputs → null.
  */
case class EditDistanceWithin(left: Expression, right: Expression, threshold: Int)
    extends BinaryExpression {

  require(threshold >= 0, "threshold must be >= 0")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"edit_distance_within expects two string inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Integer.valueOf(EditDistanceWithin.dist(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], threshold))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = EditDistanceWithin.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $cls.dist($a, $b, $threshold);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): EditDistanceWithin =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "edit_distance_within"
}

object EditDistanceWithin {

  /** Shared by interpreted eval and generated code. */
  def dist(au: UTF8String, bu: UTF8String, k: Int): Int = {
    // code points, so edits count exactly like levenshtein()'s
    val a = au.toString.codePoints().toArray
    val b = bu.toString.codePoints().toArray
    var lo = 0
    var aHi = a.length
    var bHi = b.length
    while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
    while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val n = aHi - lo
    val m = bHi - lo
    if (Math.abs(n - m) > k) return -1
    if (n == 0) return m // m <= k by the length check
    if (m == 0) return n
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      cur(0) = if (i <= k) i else inf
      val from = Math.max(1, i - k)
      val to = Math.min(m, i + k)
      var best = inf
      j = from
      while (j <= to) {
        val cost = if (a(lo + i - 1) == b(lo + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        if (del < v) v = del
        if (ins < v) v = ins
        cur(j) = if (v > k) inf else v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return -1 // the whole band is over k — no path back
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }
}
