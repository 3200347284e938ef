package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring (duplicate-span) removal: REWRITE documents by dropping
  * token blocks whose exact content appears elsewhere in the corpus,
  * keeping one canonical occurrence — the corpus-release step from
  * "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al., 2022), approximated on an aligned non-overlapping block
  * grid instead of a suffix array (the standard distributed relaxation:
  * a grid membership test is one shuffle; a suffix array is not
  * expressible as a bounded-state aggregation).
  *
  * Whole-document dedup ([[ExactDedup]], [[MinHashLSH]]) drops or keeps
  * entire rows; this operator edits row CONTENT — boilerplate and copied
  * passages vanish while the host documents survive.
  *
  * Semantics: tokenize; cut the token array into consecutive blocks of
  * `blockTokens` (the last block short). A FULL block is kept iff it is
  * the corpus-wide canonical occurrence of its content — the minimum
  * (doc, position) — or unique; short (trailing) blocks never dedup, so
  * sub-block tails and short documents pass through verbatim. The
  * document is re-assembled from its kept blocks in order.
  *
  * Shape at scale: explode to (doc, pos, block) — map-only in the scan
  * stage; ONE shuffle on the 128-bit block hash where a window computes
  * each content group's size and canonical occurrence (no self-join, no
  * agg+join round trip); ONE shuffle back on doc id to re-assemble.
  * Rows carry the block text through the first exchange so re-assembly
  * needs no second scan; at extreme skew (a boilerplate block repeated
  * billions of times) the decision pass can instead ship only
  * (doc, pos, hash) and re-derive text map-side — same semantics, one
  * more exchange, noted here as the narrow variant.
  */
object SpanDedup {

  /** Per document: block counts and the text with duplicated spans
    * removed. Output columns: idCol, n_blocks, n_kept, dedup_text.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           blockTokens: Int = 20): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val tk = graft.text.TextFunctions.tokens(coalesce(col(textCol), lit("")))
    val blocks = df
      .select(col(idCol), explode(
        graft.text.TextFunctions.tokenChunks(tk, blockTokens, 0)).as("__ch"))
      .select(col(idCol), col("__ch.s").as("__s"),
        concat_ws(" ", col("__ch.ctoks")).as("__btext"),
        size(col("__ch.ctoks")).as("__blen"))
      .withColumn("__h", md5(col("__btext")))
    val byContent = Window.partitionBy("__h")
    val decided = blocks
      .withColumn("__cnt", count(lit(1)).over(byContent))
      .withColumn("__keeper",
        min(struct(col(idCol), col("__s"))).over(byContent))
      .withColumn("__kept",
        col("__blen") < blockTokens || col("__cnt") === 1 ||
          struct(col(idCol), col("__s")) === col("__keeper"))
    decided.groupBy(idCol)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("__s"), col("__btext"))))),
          b => b.getField("__btext"))).as("dedup_text"))
  }
}
