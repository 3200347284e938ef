package graft.dedup

import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication (Abbas et al., 2023: cluster the
  * embedding space, then drop near-identical neighbors WITHIN each
  * cluster): assignment to a codebook of centroids bounds the candidate
  * set, so the quadratic pair scan runs per-cell instead of per-corpus —
  * the k-means analogue of [[EmbeddingNearDup]]'s sign-LSH bucketing.
  *
  * Scale shape: the codebook is broadcast (k rows); assignment is a
  * map-side cross-score + one partial-aggregated argmax shuffle keyed by
  * the embedding id; the per-cell self-join shuffles once on the cell id
  * with expected n²/k candidate pairs. Nothing is ever all-pairs across
  * cells. Train the codebook with [[graft.similarity.KMeans.train]] (or
  * any fixed sample of the corpus — the choice moves recall, never
  * soundness, and a FIXED codebook keeps the operator deterministic and
  * oracle-checkable).
  *
  * Ranking and thresholding use cosine rounded to 6 dp with id
  * tie-breaks (the same determinism contract as the `knn_*` queries), so
  * both engines resolve borderline pairs identically.
  */
object SemanticDedup {

  /** Each embedding with its nearest-centroid cell: argmax of rounded
    * cosine, earlier centroid id wins ties. Null/zero-norm embeddings
    * score NaN against every centroid and fall into the lowest cell id.
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, centIdCol: String, centVecCol: String): DataFrame = {
    val scored = emb.crossJoin(broadcast(
        centroids.select(col(centIdCol).as("__cid"), col(centVecCol).as("__cv"))))
      .withColumn("__cos", round(Knn.cosine(col(vecCol), col("__cv")), 6))
    scored.groupBy(col(idCol))
      .agg(
        max_by(col("__cid"), struct(col("__cos"), -col("__cid"))).as("cell"),
        first(col(vecCol)).as(vecCol))
  }

  /** Kept rows of `emb` (id + cell): within each cell, the LOWER id of
    * every pair with cosine ≥ `tau` survives — a document is dropped iff
    * a lower-id near-duplicate shares its cell.
    */
  def keep(emb: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame, centIdCol: String, centVecCol: String,
           tau: Double): DataFrame = {
    // The assignment relation feeds BOTH sides of the per-cell self-join
    // and the final keep, and Spark re-executes shared subtrees per
    // consumer — the scan + centroid scoring + argmin ran three times.
    // Materialize it once (round 11, guide §1.2/§3.3): the relation is
    // one row per embedding (id, cell, vec, norm), the smallest shape
    // this operator ever holds, and the three consumers read it instead
    // of re-assigning the corpus.
    val assigned = assign(emb, idCol, vecCol, centroids, centIdCol, centVecCol)
      .withColumn("__n", Knn.norm(col(vecCol)))
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col(idCol).as("__ida"),
      col(vecCol).as("__va"), col("__n").as("__na"))
    val b = assigned.select(col("cell"), col(idCol).as("__idb"),
      col(vecCol).as("__vb"), col("__n").as("__nb"))
    val drops = a.join(b, "cell")
      .where(col("__ida") < col("__idb"))
      .where(round(Knn.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")), 6) >= tau)
      .select(col("__idb").as(idCol)).distinct()
    assigned.select(col(idCol), col("cell"))
      .join(drops, Seq(idCol), "left_anti")
  }
}
