package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the trainer that
  * produces [[Knn.ivfTopK]]'s centroid lists (FAISS trains IVF coarse
  * quantizers the same way). Deliberately minimal: k and iteration counts
  * for IVF coarse quantization are small (k ≈ √N lists), so the right
  * Spark shape is
  *
  *  - assignment: map-only pass, centroids broadcast as literals
  *    (k·dim floats — metadata-scale);
  *  - update: per-dimension mean via posexplode → one partial-aggregated
  *    shuffle of (list, dim) — k·dim result rows back to the driver.
  *
  * Per iteration that is ONE shuffle of k·dim·partitions partial sums; no
  * data row ever reaches the driver. Seeding is content-stable (hash
  * order, like every sampling decision in graft.sampling) so training is
  * reproducible across runs and partitionings.
  *
  * Float means are not bit-stable across reduction orders, so k-means has
  * no DuckDB-hash oracle; its contract is spec'd instead (KMeansSpec:
  * recovers well-separated blob centers; trained-centroid full-probe IVF
  * ≡ brute force).
  */
object KMeans {

  /** `iters` rounds of Lloyd's algorithm from deterministic hash-order
    * seeds; returns the k centroids (lists that end an iteration empty
    * keep their previous centroid).
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
            iters: Int = 5): Seq[Array[Float]] = {
    require(k >= 1 && iters >= 0, s"bad k=$k / iters=$iters")
    val seeds = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(graft.sampling.Sampling.bucket(col(idCol)).asc, col(idCol).asc)
      .limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    var centroids: Seq[Array[Float]] = seeds.toSeq
    for (_ <- 0 until iters) {
      val assigned = corpus.select(col(vecCol).as("v"),
        nearestCentroid(col(vecCol), centroids).as("list_id"))
      val means = assigned
        .select(col("list_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("list_id", "dim")
        .agg(avg(col("x").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (list, rows) =>
          list -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
        }
      centroids = centroids.indices.map(i => means.get(i).map(_.toArray).getOrElse(centroids(i)))
    }
    centroids
  }

  /** Index (0-based) of the nearest centroid by squared L2 — the same
    * assignment rule [[Knn.ivfTopK]] applies at query time.
    */
  private def nearestCentroid(vec: org.apache.spark.sql.Column,
                              centroids: Seq[Array[Float]]): org.apache.spark.sql.Column = {
    val centArr = array(centroids.map(cv =>
      array(cv.toIndexedSeq.map(x => lit(x)): _*)): _*)
    val idxed = transform(sequence(lit(0), lit(centroids.length - 1)), i =>
      struct(aggregate(
        zip_with(vec, element_at(centArr, i + 1), (x, y) =>
          (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("d"), i.as("i")))
    element_at(transform(array_sort(idxed), s => s.getField("i")), 1)
  }
}
