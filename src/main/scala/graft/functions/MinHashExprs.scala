package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels of the MinHash/n-gram-hash family. Each replicates an
  * existing declarative formulation BIT-EXACTLY (the DuckDB oracles replay
  * that math in SQL), replacing interpreted higher-order lambdas with one
  * codegen'd loop. Differential specs: MinHashExprsSpec.
  */

/** 32-bit base hash per token: `transform(toks, t =>
  * conv(substring(md5(t),1,8),16,10))` — i.e. the first 4 md5 bytes as an
  * unsigned int — hashed ONCE per token (the interpreted rolling-combine
  * formulation re-hashed each token n times as the window slid).
  */
case class TokenHashes32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_hashes expects array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes32.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenHashes32.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.hashes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes32 =
    copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

object TokenHashes32 {
  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def hash(t: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(t.getBytes)
    // first 8 hex digits of md5 = first 4 bytes, unsigned
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Shared by interpreted eval and generated code. Null tokens never
    * occur in tokenizer output; a null element hashes like the empty
    * string to keep the expression total.
    */
  def hashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) hash(UTF8String.EMPTY_UTF8) else hash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 40-bit xxhash64 token hash: `transform(toks, t => pmod(xxhash64(t),
  * 2^40))` — the [[graft.dedup.NgramJaccard]] base hash (wide enough for
  * its unreduced n≤3 rolling combine), one codegen'd pass.
  */
case class TokenHashesXx40(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_hashes_xx40 expects array<string>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenHashesXx40.hashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokenHashesXx40.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.hashes($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashesXx40 =
    copy(child = newChild)

  override def prettyName: String = "token_hashes_xx40"
}

object TokenHashesXx40 {
  private val Mask40 = (1L << 40) - 1 // pmod(x, 2^40) on the two's-complement long

  def hash(t: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(t, StringType, 42L) & Mask40

  /** Shared by interpreted eval and generated code. */
  def hashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) hash(UTF8String.EMPTY_UTF8) else hash(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Rolling polynomial n-gram combine over a token-hash array — the native
  * form of [[graft.dedup.Shingles.combinedShingleHashes]] with an identity
  * token hash: h(i) = fold(th[i..i+n-1], (acc,h) => pmod(acc,mod)*k + h),
  * reduced `pmod mod` at the end; `mod = 0` means no reduction (the
  * unreduced n≤3 path). Fewer than n hashes → empty array.
  */
case class RollingHashNgrams(child: Expression, n: Int, k: Long, mod: Long)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash_ngrams expects array<long>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    RollingHashNgrams.ngrams(input.asInstanceOf[ArrayData], n, k, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingHashNgrams.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.ngrams($c, $n, ${k}L, ${mod}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashNgrams =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_ngrams"
}

object RollingHashNgrams {
  private def pmod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

  /** Shared by interpreted eval and generated code. */
  def ngrams(arr: ArrayData, n: Int, k: Long, mod: Long): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return new GenericArrayData(Array.empty[Long])
    val th = arr.toLongArray()
    val out = new Array[Long](sz - n + 1)
    var i = 0
    while (i <= sz - n) {
      var acc = th(i)
      var j = 1
      while (j < n) {
        acc = (if (mod > 0) pmod(acc, mod) else acc) * k + th(i + j)
        j += 1
      }
      out(i) = if (mod > 0) pmod(acc, mod) else acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All `numHashes` MinHash signature slots in ONE pass over the shingle
  * hashes: slot_i = min over h of (a_i·h + b_i) mod [[graft.dedup.MinHashLSH.Prime]]
  * with the library's fixed affine family (a_i = 2i+1001, b_i = 7i+101) —
  * the native form of k separate `array_min(transform(hs, ...))` columns
  * (k interpreted passes per row). Empty input → null (array_min of an
  * empty array), so guarded callers behave identically.
  */
case class MinHashSigs(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs expects array<long>, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.sigs(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinHashSigs.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = $cls.sigs($c, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  /** Shared by interpreted eval and generated code; null for empty input. */
  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz == 0) return null
    val prime = graft.dedup.MinHashLSH.Prime
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val hs = arr.toLongArray()
    var j = 0
    while (j < sz) {
      val h = hs(j)
      var i = 0
      while (i < k) {
        val v = (h * (2L * i + 1001L) + (7L * i + 101L)) % prime
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
