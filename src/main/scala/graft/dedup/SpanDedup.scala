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
  * billions of times) `carryText = false` ships only (doc, pos, hash)
  * through the decision exchange and re-derives text map-side — same
  * semantics, one more exchange, uniform shuffle keys throughout.
  */
object SpanDedup {

  /** Per document: block counts and the text with duplicated spans
    * removed. Output columns: idCol, n_blocks, n_kept, dedup_text.
    *
    * `carryText = true` (default) ships the block text through the
    * content-hash exchange — one scan, two shuffles. `carryText = false`
    * is the SKEW-SAFE path: the decision relation is (id, pos, hash)
    * only, so a boilerplate block repeated a billion times concentrates
    * 24-byte rows — not documents — on its reducer; the kept flags then
    * join a re-derived (map-side) block relation shuffled by the UNIFORM
    * (id, pos) key. Same semantics, one extra scan+exchange.
    */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           blockTokens: Int = 20,
                           carryText: Boolean = true): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val blocks = blockRelation(df, idCol, textCol, blockTokens)
    val decided =
      if (carryText) decideKept(blocks, idCol, blockTokens)
      else {
        val flags = decideKept(
          blocks.select(col(idCol), col("__s"), col("__blen"), col("__h")),
          idCol, blockTokens)
          .select(col(idCol), col("__s"), col("__kept"))
        blockRelation(df, idCol, textCol, blockTokens)
          .join(flags, Seq(idCol, "__s"))
      }
    decided.groupBy(idCol)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("__s"), col("__btext"))))),
          b => b.getField("__btext"))).as("dedup_text"))
  }

  /** (id, pos, text, len, 128-bit hash) — map-only in the scan stage. */
  private def blockRelation(df: DataFrame, idCol: String, textCol: String,
                            blockTokens: Int): DataFrame = {
    val tk = graft.text.TextFunctions.tokens(coalesce(col(textCol), lit("")))
    df.select(col(idCol), explode(
        graft.text.TextFunctions.tokenChunks(tk, blockTokens, 0)).as("__ch"))
      .select(col(idCol), col("__ch.s").as("__s"),
        concat_ws(" ", col("__ch.ctoks")).as("__btext"),
        size(col("__ch.ctoks")).as("__blen"))
      .withColumn("__h", md5(col("__btext")))
  }

  /** Canonical-occurrence decision: one window shuffle on the hash. */
  private def decideKept(blocks: DataFrame, idCol: String,
                         blockTokens: Int): DataFrame = {
    val byContent = Window.partitionBy("__h")
    blocks
      .withColumn("__cnt", count(lit(1)).over(byContent))
      .withColumn("__keeper",
        min(struct(col(idCol), col("__s"))).over(byContent))
      .withColumn("__kept",
        col("__blen") < blockTokens || col("__cnt") === 1 ||
          struct(col(idCol), col("__s")) === col("__keeper"))
  }
}
