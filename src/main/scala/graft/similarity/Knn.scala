package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate & exact nearest-neighbor search over an embedding column
  * (`array<float>`), all native expressions.
  *
  * Two paths, one contract (query_id, rank, neighbor_id, cosine):
  *  - [[bruteForceTopK]]: exact, O(|Q|·|C|). The *query set* is broadcast —
  *    on a 1000-executor cluster each corpus partition scores locally and
  *    only |Q|·k candidate rows shuffle to rank. Correct baseline.
  *  - [[signLshTopK]]: sign-of-dimension LSH buckets (axis-aligned
  *    hyperplanes). Corpus and queries bucket by the sign pattern of the
  *    first `planes` dimensions; scoring joins on the bucket — the
  *    Spark-shaped IVF: co-partitioned equi-join instead of a cross join,
  *    1/2^planes of the corpus scanned per query in expectation.
  *    Deterministic and oracle-checkable (no random hyperplanes needed for
  *    the contract; swap in random projections at the same seam for better
  *    recall-vs-speed tradeoffs).
  */
object Knn {

  /** Sequential-order dot product via the codegen'd
    * [[graft.functions.FloatVectorDot]] expression (the interpreted
    * `aggregate(zip_with(...))` formulation pays per-element lambda +
    * boxing costs on the hottest scalar of the family).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.FloatVectorDot(
      GraftBridge.convertedExpression(a), GraftBridge.convertedExpression(b)))
  }

  /** Cosine similarity of two float-array columns (double math, rounded to
    * 6 dp so independent engines agree bit-for-bit on the output).
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** L2 norm — precompute this per ROW before a candidate join: scoring a
    * pair then costs one dot instead of three (each side's self-dot is
    * computed once per vector, not once per candidate pair). Same double
    * math as [[cosine]], so the rounded result is bit-identical.
    */
  def norm(v: Column): Column = sqrt(dot(v, v))

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    rank(q.crossJoin(c).where(col("query_id") =!= col("neighbor_id")), k)
  }

  /** Bucket = sign pattern of the first `planes` dimensions. Dimensions
    * beyond the vector's length bucket as '0' (`try_element_at`, not
    * `element_at` — the latter is a runtime error under ANSI mode for a
    * short or empty embedding row, killing the whole job).
    */
  def signBucket(vec: Column, planes: Int): Column =
    concat((0 until planes).map(i =>
      when(try_element_at(vec, lit(i + 1)) > 0f, "1").otherwise("0")): _*)

  def signLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, planes: Int = 4): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), signBucket(col(vecCol), planes).as("bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), signBucket(col(vecCol), planes).as("bucket"))
    rank(q.join(c, "bucket").where(col("query_id") =!= col("neighbor_id")), k)
  }

  /** IVF (inverted-file) ANN: corpus vectors are assigned to their nearest
    * centroid ("list"); each query probes only the `nprobe` nearest lists.
    * The Spark shape of FAISS-style IVF: assignment is a map-only pass
    * (centroids broadcast), scoring is a co-partitioned equi-join on the
    * list id — corpus shuffles once by list, queries fan out nprobe rows
    * each. Expected scan fraction ≈ nprobe/nlist of the corpus.
    *
    * Centroids here are caller-provided (train them however you like —
    * k-means offline, or pass a deterministic sample for reproducible
    * tests). Recall is governed by nprobe/nlist exactly as in IVF indexes.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: Seq[Array[Float]],
              idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"),
      element_at(nearestLists(col(vecCol), centroids, 1), 1).as("list_id"))
    ivfTopKAssigned(c, queries, centroids, idCol, vecCol, k, nprobe)
  }

  /** [[ivfTopK]] over a corpus that ALREADY carries its list assignment
    * (`neighbor_id`, `cv`, `cn`, `list_id`) — the query path of a
    * persisted [[IvfIndex]], where assignment happened at write time and
    * the scan is partition-pruned to the probed lists.
    */
  def ivfTopKAssigned(corpusAssigned: DataFrame, queries: DataFrame,
                      centroids: Seq[Array[Float]], idCol: String, vecCol: String,
                      k: Int, nprobe: Int): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"),
      explode(nearestLists(col(vecCol), centroids, nprobe)).as("list_id")))
    rank(q.join(corpusAssigned, "list_id")
      .where(col("query_id") =!= col("neighbor_id")), k)
  }

  /** K-nearest-neighbor JOIN: the top-k neighbors of EVERY vector — the
    * all-pairs building block of kNN-graph construction (SemDeDup cluster
    * seeding, graph-based dedup, embedding-space diagnostics). Unlike
    * [[ivfTopKAssigned]] the "query" side is the whole corpus, so nothing
    * is broadcast: both sides hash-shuffle on the IVF list id and the join
    * is co-partitioned — each vector scores only against the `nprobe`
    * nearest lists' members, never the full corpus. Expected pair count ≈
    * nprobe/nlist · n², vs n² for the naive self-cross-join; at 100 TB the
    * list id is the ONLY shuffle key and no single task sees more than its
    * lists' vectors (size lists via the k-means trainer so the largest
    * list fits one task).
    *
    * `nprobe = centroids.length` makes it EXACT (every (q,c) pair meets on
    * c's one assigned list exactly once) — the differential-testing seam:
    * full-probe ≡ brute force, oracle-checkable; recall-vs-cost at scale
    * is the usual IVF nprobe knob.
    */
  def knnJoin(vectors: DataFrame, centroids: Seq[Array[Float]], idCol: String,
              vecCol: String, k: Int, nprobe: Int): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
    // The corpus side STREAMS the blocked join (q broadcasts), so join
    // parallelism = its scan partitioning. A small-file corpus (one
    // parquet file = one partition) would push every blocked pair
    // through a single task — measured 8.7 s vs 1.7 s at sf0.1 — so
    // rebalance only when the scan has fewer splits than the session's
    // parallelism. At real scale the input is thousands of splits and the
    // exchange is skipped.
    val spread = vectors.rdd.getNumPartitions <
      vectors.sparkSession.sparkContext.defaultParallelism
    val base =
      if (spread) vectors.repartition(
        vectors.sparkSession.sessionState.conf.numShufflePartitions)
      else vectors
    // Both join sides need the same per-vector prep — the probe-list
    // nearest-centroid sort (non-codegen higher-order functions, the
    // dominant per-row cost) and the self-dot norm. Spark re-executes a
    // shared subtree once per consumer, so without a barrier the corpus
    // is scanned and prepped TWICE (round 12, §1.2). Materialize the
    // prepped relation once, lazily: the first join action computes it
    // and truncates lineage; plan-only callers never pay a job. The
    // corpus side's assigned list is the first probe entry (nprobe ≥ 1),
    // identical to the former nearestLists(vec, centroids, 1) head.
    val prep = base.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"),
      nearestLists(col(vecCol), centroids, nprobe).as("lists"))
      .localCheckpoint(false)
    val c = prep.select(col("id").as("neighbor_id"), col("vec").as("cv"),
      col("nrm").as("cn"), element_at(col("lists"), 1).as("list_id"))
    val q = prep.select(col("id").as("query_id"), col("vec").as("qv"),
      col("nrm").as("qn"), explode(col("lists")).as("list_id"))
    rank(q.join(c, "list_id").where(col("query_id") =!= col("neighbor_id")), k)
  }

  /** O(batch) kNN-graph MAINTENANCE: fold a batch of new vectors into an
    * existing [[knnJoin]] graph without rescanning corpus × corpus — the
    * similarity-family analogue of the table layer's incremental
    * aggregates and the MinHash index's incremental probe. Two
    * batch-proportional blocked joins:
    *
    *  1. the new vectors query the combined corpus for their own top-k;
    *  2. existing nodes gain candidates FROM THE BATCH ONLY (the reverse
    *     blocked join), merged with their current top-k and re-cut at k —
    *     sound because a node's updated top-k can only contain its old
    *     top-k or a new arrival; pre-existing non-neighbors can never
    *     re-enter.
    *
    * At full probe the result is EXACTLY [[knnJoin]] over corpus ∪ batch
    * (the differential spec); at partial probe it inherits the same
    * nprobe recall contract. Ids must be disjoint between corpus and
    * batch (same contract as any append).
    */
  def knnJoinIncremental(graph: DataFrame, corpus: DataFrame, batch: DataFrame,
                         centroids: Seq[Array[Float]], idCol: String, vecCol: String,
                         k: Int, nprobe: Int): DataFrame = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.length)
    def assigned(df: DataFrame) = df.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"),
      element_at(nearestLists(col(vecCol), centroids, 1), 1).as("list_id"))
    def probing(df: DataFrame) = df.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"),
      explode(nearestLists(col(vecCol), centroids, nprobe)).as("list_id"))
    // 1. new nodes vs (corpus ∪ batch)
    val allAssigned = assigned(corpus.select(idCol, vecCol)
      .unionByName(batch.select(idCol, vecCol)))
    val newEdges = rank(probing(batch).join(allAssigned, "list_id")
      .where(col("query_id") =!= col("neighbor_id")), k)
    // 2. existing nodes vs batch only, merged with their current edges
    val candidates = probing(corpus).join(assigned(batch), "list_id")
      .withColumn("cosine",
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
      .select("query_id", "neighbor_id", "cosine")
    val merged = graph.select("query_id", "neighbor_id", "cosine")
      .unionByName(candidates)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val updated = merged.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
    updated.unionByName(newEdges)
  }

  /** The `n` nearest centroid indices (0-based) of `vec` by squared L2 —
    * the IVF list-probe rule, shared by assignment and query sides.
    */
  private[similarity] def nearestLists(vec: Column, centroids: Seq[Array[Float]],
                                       n: Int): Column = {
    val centArr = array(centroids.map(cv =>
      array(cv.toIndexedSeq.map(x => lit(x)): _*)): _*)
    val d = transform(centArr, cv => aggregate(
      zip_with(vec, cv, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v))
    // indices of the n smallest distances: sort (dist, idx) structs
    val idxed = transform(sequence(lit(0), lit(centroids.length - 1)), i =>
      struct(element_at(d, i + 1).as("d"), i.as("i")))
    slice(transform(array_sort(idxed), s => s.getField("i")), 1, n)
  }

  /** Expects per-side precomputed norms (`qn`, `cn`): the per-pair score
    * is then ONE dot product.
    */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val withCos = scored.withColumn("cosine",
      round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    withCos.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
