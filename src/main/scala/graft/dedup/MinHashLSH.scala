package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection.
  *
  * Hash family: each shingle is hashed ONCE to a 32-bit base value (the
  * first 8 hex digits of its md5 — engine-agnostic, so every stage stays
  * DuckDB-oracle checkable), then k affine permutations
  * h_k(x) = (a_k·x + b_k) mod p (p prime > 2^32) approximate k independent
  * min-wise permutations — the standard construction, at one digest + k
  * multiply-adds per shingle instead of k digests.
  *
  * Scale shape (the point of LSH): signatures are one groupBy over exploded
  * shingles with k `min` partial aggregates — map-side combine collapses
  * each input partition to one row per doc before the shuffle. Candidate
  * generation shuffles by (band_idx, band_hash) — identical docs all land
  * in the same band bucket, so hot buckets = true duplicate clusters; the
  * self-join is bounded per bucket, never all-pairs. Brute-force Jaccard
  * over 100 TB is O(n²) and impossible; this is O(n · k + candidate pairs).
  */
object MinHashLSH {

  /** Prime modulus > 2^32; a·x + b stays well inside Long. */
  val Prime = 4294967311L

  /** Deterministic odd multipliers / offsets for the affine family. */
  def hashParams(k: Int): Seq[(Long, Long)] =
    (0 until k).map(i => (2L * i + 1001L, 7L * i + 101L))

  /** 32-bit base hash of a token/shingle, identical in Spark and DuckDB:
    * Spark `conv(substring(md5(s),1,8),16,10)`,
    * DuckDB `('0x'||substr(md5(s),1,8))::BIGINT`.
    */
  def baseHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 8), 16, 10).cast("long")

  /** Combine multiplier and final modulus of the token-hash rolling
    * combine (see [[Shingles.combinedShingleHashes]]); the 2^32 modulus
    * keeps shingle hashes inside the affine family's domain. Mirror in
    * DuckDB as `((th[i]*1024 + th[i+1])*1024 + th[i+2]) % 4294967296`.
    */
  val CombineK = 1024L
  val CombineMod = 4294967296L

  /** Per-doc shingle-hash array from a materialized token attribute —
    * native: one md5 per token ([[graft.functions.TokenHashes32]]; the
    * interpreted combine re-hashed each token n times) + the codegen'd
    * rolling combine ([[graft.functions.RollingHashNgrams]]). Bit-equal to
    * `Shingles.combinedShingleHashes(toks, n, baseHash, CombineK,
    * Some(CombineMod))` (MinHashExprsSpec).
    */
  def shingleHashes(toksAttr: Column, shingleSize: Int): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.RollingHashNgrams(
      graft.functions.TokenHashes32(GraftBridge.convertedExpression(toksAttr)),
      shingleSize, CombineK, CombineMod))
  }

  /** Per-doc signature: columns (id, sig_0 .. sig_{k-1}), each a Long.
    *
    * Zero-shuffle: each signature is an `array_min` over the per-row
    * shingle-hash array — a pure map-side projection (the explode +
    * groupBy formulation pays a full shuffle of every shingle row for the
    * same answer). Duplicates in the raw shingle list are harmless: the
    * min over the multiset equals the min over the set.
    */
  def signatures(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 16, shingleSize: Int = 3): DataFrame = {
    // Filter on token count, NOT size(hs): a predicate on a derived array
    // gets inlined through the projection and re-runs the whole chain a
    // second time per row (measured +3.5 s at sf0.1). Token re-split is
    // pennies. Tokens then materialize as an attribute so the rolling
    // combine reads them by index (see Shingles.combinedShingleHashes).
    val base = df
      .where(size(graft.text.TextFunctions.tokens(col(textCol))) >= shingleSize)
      .select(col(idCol), graft.text.TextFunctions.tokens(col(textCol)).as("tk"))
      .select(col(idCol), shingleHashes(col("tk"), shingleSize).as("hs"))
    // all k affine mins in ONE native pass over hs
    // ([[graft.functions.MinHashSigs]]), then fanned out to the sig_i
    // column contract (codegen subexpression elimination keeps the array
    // computed once per row); bit-equal to the k-array_min formulation
    val sigsArr = {
      import org.apache.spark.sql.graftbridge.GraftBridge
      GraftBridge.column(graft.functions.MinHashSigs(
        GraftBridge.convertedExpression(col("hs")), k))
    }
    base.select(col(idCol), sigsArr.as("__sigs"))
      .select(col(idCol) +:
        (0 until k).map(i => element_at(col("__sigs"), i + 1).as(s"sig_$i")): _*)
  }

  /** Banded candidate pairs (a < b), `bands` bands of k/bands rows each:
    * docs agreeing on any full band are candidates.
    *
    * `maxBucketSize` caps the per-(band, hash) bucket before the
    * self-join — the hot-band analogue of [[NgramJaccard]]'s df-cut. A
    * pathological cluster of m near-identical docs otherwise lands in ONE
    * bucket and emits m²/2 pairs per band; at 100 TB that single skewed
    * bucket is the job. Recall note: pairs inside a dropped bucket are
    * only lost if the docs agree on NO other (uncapped) band; exact
    * mega-clusters are better handled by [[ExactDedup]] first, which is
    * why the cap is safe operationally.
    */
  /** Exploded banded hashes of a signature table: one row per (doc,
    * band), `band_hash` = md5 of the band's '|'-joined signature slots —
    * the single definition shared by the one-shot [[candidatePairs]] and
    * the persisted [[MinHashIndex]], so stored and fresh signatures can
    * never band differently (DuckDB mirror:
    * `md5(sig_i::VARCHAR)` per single-slot band).
    */
  def bandHashes(sigs: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => col(s"sig_${b * rows + r}").cast("string"))
      struct(lit(b).as("band_idx"), md5(concat_ws("|", parts: _*)).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  def candidatePairs(df: DataFrame, textCol: String, idCol: String,
                     k: Int = 16, bands: Int = 8, shingleSize: Int = 3,
                     maxBucketSize: Option[Int] = None): DataFrame = {
    // Materialization barrier (round 11 — replaces the former repartition
    // barrier): the banded relation feeds BOTH sides of the self-join
    // below and Spark re-executes shared subtrees per consumer, so the
    // whole shingle → minhash pipeline ran TWICE (verified in the
    // executed plan: two full FileScan+minhash_sigs branches, zero
    // ReusedExchange). An eager localCheckpoint of the signature table —
    // n_docs × (k+1) longs, tiny at any corpus scale — runs the shingle
    // work exactly once AND still blocks the band explode from inlining
    // the pipeline into every band column (the job the old exchange
    // barrier did, measured 8 s vs 5 s at sf0.1), without the extra
    // shuffle that barrier cost.
    val sigs = signatures(df, textCol, idCol, k, shingleSize)
      .localCheckpoint(true)
    val exploded = bandHashes(sigs, idCol, k, bands)
    // Hot-bucket cap: one window count over the same (band, hash) shuffle
    // key the join uses — no extra exchange — then drop oversized buckets.
    val banded = maxBucketSize match {
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))
        exploded.withColumn("__bucket_n", count(lit(1)).over(w))
          .where(col("__bucket_n") <= cap).drop("__bucket_n")
      case None => exploded
    }
    val l = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val r = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }
}
