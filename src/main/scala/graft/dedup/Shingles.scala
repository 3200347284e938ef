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
    // native one-pass tokenize + n-gram join ([[graft.functions.GraftTokens]]
    // / [[graft.functions.WordNgrams]]): the former interpreted
    // transform(sequence)/array_join(slice) chain paid ~20µs per shingle
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.WordNgrams(
      GraftBridge.convertedExpression(graft.text.TextFunctions.tokens(text)), n))
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

  /** Shingle hashes WITHOUT building shingle strings: a rolling polynomial
    * combine of per-token hashes, h(i) = fold(th[i..i+n-1], (acc,h) =>
    * acc*K + h). Building ~290 joined strings per doc inside interpreted
    * higher-order lambdas is the measured dominant cost of every shingle
    * pipeline (≈3.1 s of a 4 s pass at sf0.1); arithmetic over token
    * hashes removes it. Each token is hashed n× as the window slides —
    * hashing is cheap, allocation was not.
    *
    * `toksAttr` MUST be a materialized attribute (select the token array
    * into a column first): it is referenced n+1 times per element, which
    * also keeps CollapseProject from inlining the tokenization.
    *
    * Bounds: without `finalMod`, tokenHash·K^(n-1) must stay < 2^63 (ANSI
    * overflow otherwise — e.g. 2^40-bit hashes with K=2^11 support n=3).
    * With `finalMod` M the accumulator is reduced mod M before each
    * multiply — congruent to the plain polynomial mod M, overflow-free for
    * any n, and exactly mirrorable in integer SQL.
    */
  def combinedShingleHashes(toksAttr: Column, n: Int,
                            tokenHash: Column => Column,
                            k: Long = 1024L,
                            finalMod: Option[Long] = None): Column =
    when(size(toksAttr) < n, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), size(toksAttr) - (n - 1)), i => {
        val step: (Column, Column) => Column = finalMod match {
          case Some(m) => (acc, h) => pmod(acc, lit(m)) * k + h
          case None    => (acc, h) => acc * k + h
        }
        val combined = (0 until n)
          .map(j => tokenHash(element_at(toksAttr, i + lit(j))))
          .reduceLeft(step)
        finalMod.map(m => pmod(combined, lit(m))).getOrElse(combined)
      }))
}
