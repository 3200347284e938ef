package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word-level n-gram shingling as a native expression (no explode needed at
  * the shingling step — `transform` over a sequence keeps it inside
  * whole-stage codegen; downstream set ops decide whether to explode).
  */
object Shingles {

  /** Distinct word n-shingles of the normalized text, joined by single
    * spaces. DuckDB-expressible with list comprehension over string_split.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = graft.text.TextFunctions.tokens(text)
    // sequence(1, k) with k<1 would generate a DESCENDING [1,0] — guard it.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        array_join(slice(toks, i, lit(n)), " "))))
  }
}
