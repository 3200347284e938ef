package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar): per bit position, sum +1/-1
  * votes over token hashes; the sign vector is the fingerprint. Near-dups
  * have small Hamming distance.
  *
  * Bit source: the 32 bits of the md5-based token hash
  * ([[MinHashLSH.baseHash]] — engine-agnostic, so the whole construction
  * stays DuckDB-oracle checkable with integer arithmetic:
  * `(h >> j) & 1`). The fingerprint is a single LONG with bit j set when
  * bit j's vote sum is positive. Token multiplicity counts as repeated
  * votes, matching the classic weighted construction with tf weights.
  *
  * Scale shape: one aggregate over exploded token hashes with 32 integer
  * sum() partial aggregates — map-side combine, single shuffle by doc id,
  * everything inside whole-stage codegen (an earlier string-nibble
  * formulation spent its time in interpreted substring compares).
  */
object SimHash {

  val Bits = 32

  /** Per-doc simhash as a LONG from exploded (id, token-hash) rows.
    *
    * CONTRACT: documents with zero tokens (empty/whitespace-only text)
    * produce NO output row — explode emits nothing for them, and a
    * simhash of "no content" has no meaningful value. Filter or
    * left-join accordingly (the oracle-checked query pre-filters on
    * `tokenCount > 0`); an inner join back to the corpus silently drops
    * such docs by design.
    */
  def simhashed(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val th = transform(TextFunctions.tokens(col(textCol)),
      t => MinHashLSH.baseHash(t))
    val exploded = df.select(col(idCol), explode(th).as("h"))
    val votes = (0 until Bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$j")
    }
    val fingerprint = (0 until Bits).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    exploded.groupBy(idCol)
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), fingerprint.as("simhash"))
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
