package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar): per bit position, sum +1/-1
  * votes over token hashes; the sign vector is the fingerprint. Near-dups
  * have small Hamming distance.
  *
  * Bit source: the 32 hex digits of md5(token); digit >= '8' ⇒ high bit of
  * that nibble set. 32-bit fingerprints computed entirely with native
  * expressions and identical semantics in DuckDB (hex digits compare
  * lexicographically the same way). Token multiplicity counts as repeated
  * votes, matching the classic weighted construction with tf weights.
  *
  * Scale shape: one aggregate over exploded tokens with 32 sum() partial
  * aggregates — map-side combine, single shuffle by doc id; no joins.
  */
object SimHash {

  val Bits = 32

  /** 32-char '0'/'1' fingerprint of a pre-materialized token-hash array.
    * Take the hashes as an ATTRIBUTE (select them into a column first):
    * Catalyst does not common-subexpression-eliminate higher-order
    * functions, so inlining `transform(tokens, md5)` here would recompute
    * every token's digest 32 times — measured 6.4s → 0.6s at sf0.1.
    */
  def simhashFromHashes(hashes: Column): Column = {
    val bitChars = (1 to Bits).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(substring(h, i, 1) >= "8", 1).otherwise(-1))
      when(votes > 0, "1").otherwise("0")
    }
    concat(bitChars: _*)
  }

  /** Token md5s for [[simhashFromHashes]]. */
  def tokenHashes(text: Column): Column =
    transform(TextFunctions.tokens(text), (t: Column) => md5(t))

  /** Convenience DataFrame form: hashes materialized once, then folded. */
  def simhashed(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), tokenHashes(col(textCol)).as("__th"))
      .select(col(idCol), simhashFromHashes(col("__th")).as("simhash"))

  /** Single-column form (hash materialization is the caller's job if the
    * expression is reused; fine as-is for one-off use).
    */
  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  /** Hamming distance between two fingerprint strings of equal length. */
  def hamming(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), (b: Column) => b))
}
