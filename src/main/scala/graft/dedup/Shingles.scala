package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word-level n-gram shingling as a native expression (no explode needed at
  * the shingling step — `transform` over a sequence keeps it inside
  * whole-stage codegen; downstream set ops decide whether to explode).
  */
object Shingles {

  /** All word n-shingles (with duplicates) of the normalized text, joined
    * by single spaces. Min/max-style consumers (MinHash, winnowing
    * fingerprints) use this directly — a min over the multiset equals the
    * min over the set, so paying for dedup first is pure waste.
    */
  def rawWordShingles(text: Column, n: Int): Column = {
    val toks = graft.text.TextFunctions.tokens(text)
    // sequence(1, k) with k<1 would generate a DESCENDING [1,0] — guard it.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        array_join(slice(toks, i, lit(n)), " ")))
  }

  /** Distinct word n-shingles. NOTE: array_distinct over strings is
    * O(k²) UTF8String compares — prefer [[hashedShingles]] (distinct over
    * primitive longs) or [[rawWordShingles]] wherever the consumer allows.
    */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(rawWordShingles(text, n))

  /** Distinct shingles as 64-bit hashes: dedup happens on primitive longs
    * (hash-set path, O(k)) instead of strings. Set cardinality and join
    * equality match the string-shingle semantics modulo 2⁻⁶⁴ collisions.
    */
  def hashedShingles(text: Column, n: Int): Column =
    array_distinct(transform(rawWordShingles(text, n), s => xxhash64(s)))
}
