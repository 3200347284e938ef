package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.Column
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

  /** 32-char '0'/'1' fingerprint of the text column (aggregated per row
    * via explode-free expression: transform over tokens, then fold).
    */
  def simhash(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val hashes = transform(toks, (t: Column) => md5(t))
    val bitChars = (1 to Bits).map { i =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(substring(h, i, 1) >= "8", 1).otherwise(-1))
      when(votes > 0, "1").otherwise("0")
    }
    concat(bitChars: _*)
  }

  /** Hamming distance between two fingerprint strings of equal length. */
  def hamming(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y), (b: Column) => b))
}
