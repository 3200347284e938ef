package graft.dedup

import graft.similarity.Knn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate pairs (the last member of the dedup
  * family next to exact / MinHash / SimHash / n-gram Jaccard).
  *
  * Scale path: sign-LSH bucketing (same hash family as
  * [[graft.similarity.Knn.signBucket]]) turns the all-pairs O(n²) cross
  * join into a co-partitioned self-equi-join within buckets — expected
  * n²/2^planes candidate pairs, shuffled once on the bucket key. Exact
  * cosine is then computed only on candidates. With `planes = 0` it
  * degrades to the exact brute-force all-pairs baseline.
  *
  * Recall caveat (documented, deliberate): a true near-dup pair split
  * across buckets is missed; more planes = faster + lower recall. Both
  * engines (this and the oracle) apply the same bucketing, so outputs are
  * exactly comparable.
  */
object EmbeddingNearDup {

  def pairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      planes: Int = 8
  ): DataFrame = {
    // norms precomputed per ROW (n of them), not per candidate pair
    // (n²/2^planes of them): scoring a pair is one dot product
    val withBucket =
      if (planes <= 0) df.select(col(idCol), col(vecCol),
        Knn.norm(col(vecCol)).as("__n"), lit("").as("__bucket"))
      else df.select(col(idCol), col(vecCol), Knn.norm(col(vecCol)).as("__n"),
        Knn.signBucket(col(vecCol), planes).as("__bucket"))
    val a = withBucket.select(col("__bucket"), col(idCol).as("id_a"),
      col(vecCol).as("va"), col("__n").as("na"))
    val b = withBucket.select(col("__bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("__n").as("nb"))
    a.join(b, "__bucket")
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(Knn.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
