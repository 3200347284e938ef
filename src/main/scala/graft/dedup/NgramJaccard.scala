package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate pairs with inverted-index blocking.
  *
  * Never all-pairs: docs are candidates only when they share at least one
  * shingle (inverted-index self-join on the shingle), and |A∩B| falls out
  * of the same join as `count(*)` per pair — so Jaccard costs one
  * aggregation over the join, not a second pass over documents:
  * J = |A∩B| / (|A| + |B| − |A∩B|).
  *
  * Scale notes: ultra-common shingles create hot join keys (every pair
  * sharing "the of and" meets there). For 100 TB runs, drop the top-p% most
  * frequent shingles before the join (`maxShingleFreq`) — standard df-cut —
  * which bounds per-key fan-out; near-dup pairs still meet on their rarer
  * shingles, and J is then the exact Jaccard of the SURVIVING shingle sets
  * (both |A∩B| and the set sizes come from the cut relation — consistent,
  * not biased). MinHashLSH is the probabilistic alternative when even the
  * blocked join is too big.
  */
object NgramJaccard {

  def pairs(df: DataFrame, textCol: String, idCol: String,
            n: Int = 3, threshold: Double = 0.8,
            maxShingleFreq: Option[Long] = None): DataFrame = {
    // Hashed shingles end to end, built WITHOUT shingle strings: a rolling
    // polynomial combine of per-token hashes (Shingles.combinedShingleHashes
    // — string building in interpreted lambdas was the dominant cost),
    // deduped on primitive longs. Same pair counts as string shingles
    // modulo ~2⁻²³ global collision odds in the ~2⁶² combine space.
    //
    // CRITICAL plan shape: the exploded relation carries ONLY (id, shingle).
    // Projecting size(sh) across the explode makes Catalyst re-derive the
    // whole shingle pipeline PER EXPLODED ROW (a post-Generate Project over
    // the retained text column — measured 480 s vs 3 s on the join at
    // sf0.1). Per-doc set sizes are a separate cheap pass, attached to the
    // ~|pairs| aggregate at the very end (AQE broadcasts the count table
    // when small; plain shuffle join at 100 TB).
    val toked = df
      .where(size(graft.text.TextFunctions.tokens(col(textCol))) >= n)
      .select(col(idCol).as("id"),
        graft.text.TextFunctions.tokens(col(textCol)).as("tk"))
    // The unreduced rolling combine overflows Long past n=3 (40-bit token
    // hashes × K=2^11 → ~2^73 for n=4; ANSI mode makes that a job-killing
    // ARITHMETIC_OVERFLOW). n≤3 keeps the historical unreduced hashes;
    // larger n reduces mod 2^52 each step (2^52·2^11 < 2^63 — safe for
    // any n, still a 52-bit collision space).
    val finalMod = if (n <= 3) 0L else 1L << 52
    val sh = {
      import org.apache.spark.sql.graftbridge.GraftBridge
      array_distinct(GraftBridge.column(graft.functions.RollingHashNgrams(
        graft.functions.TokenHashesXx40(GraftBridge.convertedExpression(col("tk"))),
        n, 1L << 11, finalMod)))
    }
    val exploded = toked.select(col("id"), explode(sh).as("shingle"))

    val filtered = maxShingleFreq match {
      case Some(cap) =>
        val hot = exploded.groupBy("shingle").count().where(col("count") > cap)
          .select("shingle")
        exploded.join(broadcast(hot), Seq("shingle"), "left_anti")
      case None => exploded
    }
    // Set sizes from the SAME df-cut relation as the intersection: with a
    // cap, J is then the exact Jaccard of the surviving (rare-shingle)
    // sets. Counting the unfiltered sets instead would divide a filtered
    // intersection by unfiltered sizes — systematically underestimating
    // similarity and dropping true near-dups whose overlap is on rare
    // shingles. Without a cap this equals the per-doc distinct size.
    val counts = filtered.groupBy("id").agg(count(lit(1)).as("n_sh"))

    // shuffle_hash hints make both sides hash-exchange on `shingle` with
    // identical canonical plans → ReuseExchange computes the shingle
    // pipeline ONCE for both join inputs (broadcast would rebuild it per
    // side). Same reuse fires for the two `counts` probes below.
    val l = filtered.select(col("shingle"), col("id").as("id_a")).hint("shuffle_hash")
    val r = filtered.select(col("shingle"), col("id").as("id_b")).hint("shuffle_hash")
    l.join(r, Seq("shingle")).where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")).hint("shuffle_hash"), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")).hint("shuffle_hash"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
