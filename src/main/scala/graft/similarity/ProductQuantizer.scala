package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", PAMI 2011) — the vector-compression half of a
  * FAISS-style index, complementing [[Quantize]] (SQ8) and [[IvfIndex]]:
  * split each vector into `m` subvectors, encode each against its own
  * small codebook, and search with asymmetric distance (ADC) — query
  * stays full precision, corpus is `m` small ints per vector. At 100 TB a
  * 768-dim float corpus (3 KB/vector) compresses to m=8..96 bytes, so the
  * candidate scan reads codes, not floats, and the per-pair cost is `m`
  * table lookups instead of a `dim`-wide dot product.
  *
  * Everything is native expressions (no UDFs): encoding reuses the IVF
  * nearest-centroid rule per subspace; ADC builds the query's
  * [m][k] distance table once per query row and folds it over the code
  * with `aggregate` — all inside whole-stage codegen.
  *
  * Codebooks are caller-provided (train per subspace with [[KMeans]], or
  * pass deterministic codebooks for reproducible tests — with one-hot
  * codebooks the encoder reduces to per-subspace argmax, which is the
  * oracle seam the `embedding_pq_code` query checks).
  */
object ProductQuantizer {

  private def subWidth(codebooks: Seq[Seq[Array[Float]]]): Int = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "need at least one centroid per subspace")
    val w = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == w)),
      "all subspace centroids must share one width")
    w
  }

  /** Encode `vecCol` into an `array<int>` of per-subspace centroid ids.
    * Vector length must be m * subdim (validated per row: a short vector
    * would silently encode garbage otherwise).
    */
  def encode(df: DataFrame, vecCol: String,
             codebooks: Seq[Seq[Array[Float]]],
             outCol: String = "pq_code"): DataFrame = {
    val m = codebooks.length
    val w = subWidth(codebooks)
    val guarded = when(size(col(vecCol)) === m * w, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"pq encode: vector length "), size(col(vecCol)),
        lit(s" != m*subdim = ${m * w}"))))
    val codes = array((0 until m).map { j =>
      val sub = slice(guarded, j * w + 1, w)
      element_at(Knn.nearestLists(sub, codebooks(j), 1), 1)
    }: _*)
    df.withColumn(outCol, codes)
  }

  /** Exact squared L2 between a subvector column and a centroid literal. */
  private def sqDist(sub: Column, cent: Array[Float]): Column = {
    val c = array(cent.toIndexedSeq.map(x => lit(x)): _*)
    aggregate(
      zip_with(sub, c, (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
  }

  /** ADC top-k: for each query, the k nearest encoded corpus vectors by
    * asymmetric distance (full-precision query vs quantized corpus). The
    * query side is broadcast with its precomputed [m][k] distance table;
    * each candidate costs m array lookups — the scan never touches corpus
    * floats. Output: (query_id, rank, neighbor_id, adist). Compose with
    * an IVF list equi-join (assign codes within lists) for the blocked
    * scan shape; this is the within-block scorer.
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame,
              codebooks: Seq[Seq[Array[Float]]],
              idCol: String, vecCol: String, k: Int,
              codeCol: String = "pq_code"): DataFrame = {
    val m = codebooks.length
    val table = adcDistTable(col(vecCol), codebooks)
    val q = broadcast(queries.select(col(idCol).as("query_id"), table.as("__tbl")))
    val c = encoded.select(col(idCol).as("neighbor_id"), col(codeCol).as("__code"))
    val adist = adcFold(col("__tbl"), col("__code"), m)
    val scored = q.crossJoin(c)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", round(adist, 6))
    val win = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(win))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adist")
  }

  /** The query-side [m][k] ADC distance table: exact squared L2 from each
    * query subvector to every centroid of its subspace — computed once
    * per query row, broadcast with it, then each candidate costs `m`
    * array lookups ([[adcFold]]). The building block [[adcTopK]] and the
    * IVF-blocked [[IvfIndex.searchPq]] share.
    */
  def adcDistTable(vec: Column, codebooks: Seq[Seq[Array[Float]]]): Column = {
    val w = subWidth(codebooks)
    array(codebooks.zipWithIndex.map { case (cents, j) =>
      val qsub = slice(vec, j * w + 1, w)
      array(cents.map(cArr => sqDist(qsub, cArr)): _*)
    }: _*)
  }

  /** Fold a candidate's code over the query's ADC table: m lookups. */
  def adcFold(tableCol: Column, codeCol: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(element_at(tableCol, j + 1),
          element_at(codeCol, j + 1) + 1))

  /** Train per-subspace codebooks with [[KMeans]] on a sample: m
    * independent small k-means problems over subvector slices. Driver
    * holds m * k * subdim floats — metadata-scale.
    */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int,
            iters: Int, dim: Int): Seq[Seq[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val w = dim / m
    (0 until m).map { j =>
      val sub = df.select(col(idCol), slice(col(vecCol), j * w + 1, w).as("__sub"))
      KMeans.train(sub, idCol, "__sub", k, iters)
    }
  }
}
