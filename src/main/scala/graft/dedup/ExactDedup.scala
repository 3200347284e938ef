package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by normalized-content hash.
  *
  * Scale shape: a single hash-groupBy — partial aggregation map-side, one
  * shuffle keyed by the 128-bit digest (uniform, skew-free by
  * construction). At 100 TB this is the cheapest possible dedup: no joins,
  * no windows, shuffle rows are (hash, id) pairs, not documents.
  */
object ExactDedup {

  /** Per-group summary: content hash, group size, canonical (min) id. */
  def groups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextFunctions.fingerprint(col(textCol)).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("group_size"), min(idCol).as("canonical_id"))

  /** Keep exactly one row (min id) per distinct normalized content. A
    * LEFT SEMI join, as the plan wants: emits each kept row at most once
    * even if ids repeat upstream, and never materializes keep's columns.
    */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = groups(df, textCol, idCol).select(col("canonical_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Truncation-duplicate sweep: keep one row (min id) per distinct
    * FIRST-k-TOKEN prefix — the crawl-pipeline answer to the same page
    * captured at different truncation lengths (pagination tails, byte
    * caps, "read more" cuts), which exact full-content dedup misses
    * because the tails differ. Same scale shape as
    * [[dropExactDuplicates]]: fingerprint the normalized prefix, one
    * hash groupBy on the digest, one semi-join back — no windows, no
    * pairwise comparisons, shuffle rows are (hash, id) pairs.
    */
  def dropPrefixDuplicates(df: DataFrame, textCol: String, idCol: String,
                           prefixTokens: Int = 20): DataFrame = {
    require(prefixTokens > 0, s"prefixTokens must be positive: $prefixTokens")
    val prefix = array_join(
      slice(split(trim(lower(col(textCol))), "\\s+"), 1, prefixTokens), " ")
    val keep = df.select(md5(prefix).as("__pfp"), col(idCol))
      .groupBy("__pfp").agg(min(idCol).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Incremental sweep: drop batch rows whose content already exists in a
    * previously-deduplicated corpus, then drop within-batch duplicates —
    * the shape of per-crawl ingestion against a persistent fingerprint
    * table (store `groups().select(content_hash)` once per corpus, join
    * each new crawl against it instead of re-scanning 100 TB of text).
    * The anti-join keys are 128-bit digests: uniform, skew-free, and tiny
    * relative to the documents they stand for; a daily batch is usually
    * the small side, so AQE broadcasts it against the fingerprint scan.
    */
  def incrementalSweep(batch: DataFrame, corpusHashes: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    val hashed = batch.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    hashed
      .join(corpusHashes.select(col("content_hash").as("__fp")), Seq("__fp"), "left_anti")
      .join(groups(batch, textCol, idCol).select(col("canonical_id").as(idCol)),
        Seq(idCol), "left_semi")
      .drop("__fp")
  }

  /** [[incrementalSweep]] for a corpus whose fingerprint table is too big
    * to sit on the join's build side: a Bloom sketch of the corpus
    * fingerprints replaces the batch-vs-corpus join entirely.
    *
    * Shape at scale — ZERO shuffles touch the corpus:
    *  1. one aggregate scan of the fingerprint column builds the sketch
    *     (partial sketches merged, Spark's runtime-filter machinery);
    *  2. the batch probes the broadcast sketch MAP-SIDE — rows the
    *     sketch rejects are definitively fresh (no false negatives);
    *  3. (`verify=true`) sketch-positives — a small, fpp-bounded slice —
    *     are confirmed by STREAMING the fingerprint scan against their
    *     broadcast set, so false positives never cause a wrong drop and
    *     the result is bit-identical to [[incrementalSweep]];
    *     `verify=false` skips scan 2 and accepts ≤fpp spurious drops
    *     (the usual crawl-ingestion trade).
    *
    * Sketch sizing: `expectedItems` (or a count of `corpusHashes` when
    * 0) at `fpp`, clamped to the session's runtime-bloom-filter caps —
    * raise `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` for
    * billion-document corpora (≈1.2 GB at 1e9 items / 1% fpp).
    */
  def bloomSweep(batch: DataFrame, corpusHashes: DataFrame,
                 textCol: String, idCol: String,
                 expectedItems: Long = 0L, fpp: Double = 0.01,
                 verify: Boolean = true): DataFrame = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    val n = if (expectedItems > 0) expectedItems else corpusHashes.count()
    val bloom = corpusHashes
      .select(GraftBridge.bloomFilterAgg(xxhash64(col("content_hash")), n, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    val hashed = batch.withColumn("__fp", TextFunctions.fingerprint(col(textCol)))
    val positive = GraftBridge.bloomMightContain(bloom, xxhash64(col("__fp")))
    val dupFps =
      if (!verify) hashed.filter(positive).select(col("__fp")).distinct()
      else corpusHashes.select(col("content_hash").as("__fp"))
        .join(broadcast(hashed.filter(positive).select(col("__fp")).distinct()),
          Seq("__fp"), "left_semi")
    hashed
      .join(broadcast(dupFps), Seq("__fp"), "left_anti")
      .join(groups(batch, textCol, idCol).select(col("canonical_id").as(idCol)),
        Seq(idCol), "left_semi")
      .drop("__fp")
  }
}
