package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * step that turns pairwise near-duplicate matches (MinHash/SimHash/
  * embedding pairs) into DUPLICATE CLUSTERS, so a corpus keeps one
  * canonical document per group rather than dropping only one side of
  * each pair.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round takes the min of its own and its neighbors'
  * labels; at fixpoint every node carries the minimum node id of its
  * component (= the canonical cluster id). Each round is one
  * shuffle-join + one partial-aggregated groupBy — no driver-side graph,
  * no assumptions about component count.
  *
  * Scale notes: rounds needed = graph diameter, which for near-dup
  * clusters (dense clique-ish blobs from banded LSH) is small (2–3).
  * `localCheckpoint` truncates the iterative lineage each round —
  * without it the plan doubles per iteration and the optimizer, not the
  * data, becomes the bottleneck (on a cluster with reliable storage,
  * `checkpoint` to the checkpoint dir is the durable variant). For
  * adversarial long-chain graphs prefer the alternating
  * large-star/small-star contraction (O(log n) rounds, Kiveris et al.);
  * diameter-bounded propagation is the right trade for dedup workloads.
  */
object ConnectedComponents {

  /** Cluster assignment (`id`, `cluster`) for every node appearing in
    * `edges`; `cluster` is the component's minimum node id. Throws if the
    * propagation has not reached a fixpoint within `maxIter` rounds (the
    * result would be an under-merged clustering — never silently wrong).
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 25): DataFrame = {
    // Checkpoint the edge list ONCE before the loop: `edges` may be an
    // expensive pipeline (the LSH candidate generation in dedup_clusters),
    // and every propagation round joins against sym — without this the
    // full upstream DAG re-executes once per round.
    val sym = edges.select(col(srcCol).as("id"), col(dstCol).as("nb"))
      .union(edges.select(col(dstCol).as("id"), col(srcCol).as("nb")))
      .localCheckpoint(true)
    // Seed with the 1-hop minimum (min of self and direct neighbors) —
    // the first propagation round folded into the init aggregation.
    var labels = sym
      .groupBy("id").agg(least(min("nb"), col("id")).as("cluster"))
      .localCheckpoint(true)
    val labelType = labels.schema("cluster").dataType
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbor = sym
        .join(labels.select(col("id").as("nb"), col("cluster")), "nb")
        .select(col("id"), col("cluster"), lit(null).cast(labelType).as("old"))
      // Carry each node's previous label through the same aggregation
      // (`old` is single-valued per id, so max() just recovers it): the
      // convergence check becomes a scan of the checkpointed result
      // instead of a second shuffle join per round.
      val next = labels
        .select(col("id"), col("cluster"), col("cluster").as("old"))
        .union(viaNeighbor)
        .groupBy("id")
        .agg(min("cluster").as("cluster"), max("old").as("old"))
        .localCheckpoint(true)
      converged = next.where(col("cluster") =!= col("old")).isEmpty
      labels = next.select("id", "cluster")
      i += 1
    }
    require(converged,
      s"connected components did not converge within $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter or use star-contraction")
    labels
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", 2014) — the
    * O(log n)-round alternative for graphs whose DIAMETER defeats plain
    * propagation (long chains of pairwise near-dups, adversarial link
    * structures). Per round, each node re-attaches its larger neighbors
    * (large-star) or its smaller-or-equal neighbors (small-star) to the
    * minimum of its closed neighborhood; at fixpoint every node points
    * at its component minimum — the same labels [[components]] yields.
    *
    * Each half-round is one partial-aggregated groupBy (per-node min —
    * no neighbor lists are ever collected) plus one re-join of the edge
    * relation, checkpointed to keep lineage flat. Star graphs hash-skew
    * onto their hub's reducer only for the min aggregation, which
    * map-side combines — the edge relation itself stays (src, dst) pairs.
    */
  def componentsByStarContraction(edges: DataFrame, srcCol: String, dstCol: String,
                                  maxIter: Int = 50): DataFrame = {
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct().localCheckpoint(true)
    // canonical direction u > v: every node points at a smaller neighbor
    var e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .where(col("u") > col("v")).distinct().localCheckpoint(true)
    // convergence signature: (edge count, order-independent hash sum) —
    // one tiny aggregate per round instead of a full set-difference join.
    // A signature collision on unequal edge sets (≈2⁻⁶⁴ per round) would
    // only stop one round early on a graph that was one rename from
    // fixpoint; the star-shape invariant keeps labels consistent.
    def signature(df: DataFrame): (Long, BigDecimal) = {
      // decimal sum: exact and overflow-free under ANSI mode at any count
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }
    var sig = signature(e)
    var stable = false
    var i = 0
    while (!stable && i < maxIter) {
      // large-star: attach each node's LARGER neighbors to its closed-
      // neighborhood minimum. Neighborhood here is both directions.
      // `large` is consumed twice below (the min aggregation and the
      // re-join) — persist() lets the single small-star checkpoint job
      // compute it once and reuse the cached blocks across its stages,
      // without paying a SECOND eager materialization job per round the
      // way checkpointing it here would. Lineage still truncates every
      // round at `small`'s checkpoint, so plan depth stays bounded.
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(least(min("v"), col("u")).as("m"))
      val large = sym.join(mins, "u")
        .where(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct().persist()
      try {
        // small-star: attach each node's smaller-or-equal neighbors (and
        // itself) to the minimum of its incoming smaller neighborhood —
        // both emissions from ONE join pass via an exploded pair array.
        val minsS = large.groupBy("u").agg(least(min("v"), col("u")).as("m"))
        val small = large.join(minsS, "u")
          .select(explode(array(col("v"), col("u"))).as("n"), col("m"))
          .where(col("n") =!= col("m"))
          .select(col("n").as("u"), col("m").as("v"))
          .distinct().localCheckpoint(true)
        val nextSig = signature(small)
        stable = nextSig == sig
        sig = nextSig
        e = small
      } finally large.unpersist(false)
      i += 1
    }
    require(stable, s"star contraction did not stabilize within $maxIter rounds")
    nodes.join(e.select(col("u").as("id"), col("v").as("cluster")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }
}
