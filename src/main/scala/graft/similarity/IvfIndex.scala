package graft.similarity

import graft.tables.ManagedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED IVF vector index over [[graft.tables.ManagedTable]]s — the
  * FAISS-on-disk analogue for a corpus too large to assign per query:
  *
  *  - `<name>_centroids` — the coarse quantizer (`list_id`, `centroid`),
  *    nlist·dim floats, metadata-scale;
  *  - `<name>_vectors` — every vector with its list assignment, stored
  *    PARTITIONED BY `list_id`.
  *
  * The partition layout is the index: a search probes `nprobe` lists, and
  * the partition filter prunes the scan to those directories — at 100 TB
  * the query reads ≈ nprobe/nlist of the corpus FROM DISK, not just after
  * a scan. [[addBatch]] assigns against the stored centroids (broadcast
  * literals, map-only) and appends — partition-level writes touch only
  * the lists the batch lands in, and no retrain or rewrite happens on
  * ingest (drift is handled like FAISS handles it: rebuild when recall
  * degrades).
  *
  * Assignment at write time also moves the per-row nearest-centroid scan
  * (nlist distance evaluations per vector) from EVERY query to ONCE per
  * ingest.
  */
final class IvfIndex private (spark: SparkSession, warehouse: String,
                              val name: String) {

  private def centroidsTable = ManagedTable.load(spark, warehouse, s"${name}_centroids")
    .getOrElse(throw new IllegalStateException(s"IVF index $name has no centroids table"))
  private def vectorsTable = ManagedTable.load(spark, warehouse, s"${name}_vectors")
    .getOrElse(throw new IllegalStateException(s"IVF index $name has no vectors table"))

  /** The coarse quantizer, list order — nlist·dim floats, read and
    * collected once per handle (centroids are immutable after build; a
    * rebuild returns a fresh handle via [[IvfIndex.build]]/`load`).
    */
  lazy val centroids: Seq[Array[Float]] =
    centroidsTable.read().orderBy("list_id").select("centroid")
      .collect().map(_.getSeq[Float](0).toArray).toSeq

  def nlist: Int = centroids.size

  /** Assign new vectors against the stored centroids and append. */
  def addBatch(vectors: DataFrame, idCol: String, vecCol: String): Unit =
    vectorsTable.append(vectors.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Knn.norm(col(vecCol)).as("cn"),
      element_at(Knn.nearestLists(col(vecCol), centroids, 1), 1).as("list_id")))

  /** Top-k cosine neighbors per query over the probed lists only. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nprobe: Int = 2): DataFrame =
    Knn.ivfTopKAssigned(
      probedScan(queries, vecCol, nprobe).select("neighbor_id", "cv", "cn", "list_id"),
      queries, centroids, idCol, vecCol, k, nprobe)

  /** The pruned corpus scan a `search` at `nprobe` runs: the probed list
    * set (≤ queries·nprobe ints) is resolved driver-side so the `list_id`
    * filter statically prunes the partition scan — queries are
    * broadcast-scale by contract, like every kNN query side here. Also
    * the test/capacity-planning surface (assert `PartitionFilters`).
    */
  def probedScan(queries: DataFrame, vecCol: String, nprobe: Int): DataFrame = {
    val probed = queries
      .select(explode(Knn.nearestLists(col(vecCol), centroids, nprobe)).as("list_id"))
      .distinct().collect().map(_.getInt(0)).toSeq
    vectorsTable.readPhysical().where(col("list_id").isin(probed: _*))
  }
}

object IvfIndex {

  /** Train the coarse quantizer on `corpus` and materialize both tables.
    * `nlist` ≈ √N is the usual sizing; `iters` Lloyd rounds.
    */
  def build(spark: SparkSession, warehouse: String, name: String,
            corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int, iters: Int = 5): IvfIndex = {
    val cents = KMeans.train(corpus, idCol, vecCol, nlist, iters)
    val centRows = cents.zipWithIndex.map { case (c, i) =>
      org.apache.spark.sql.Row(i, c.toSeq)
    }
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("list_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    val centDf = spark.createDataFrame(
      spark.sparkContext.parallelize(centRows, 1), centSchema)
    val centTable = ManagedTable.loadOrCreate(spark, warehouse, s"${name}_centroids",
      centSchema, Seq("list_id"))
    centTable.overwrite(centDf)

    val assigned = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      Knn.norm(col(vecCol)).as("cn"),
      element_at(Knn.nearestLists(col(vecCol), cents, 1), 1).as("list_id"))
    // REPLACE, never append: a rebuild (the drift remedy) must drop the
    // old assignments — appending would leave every vector duplicated
    // under list ids the new quantizer never probes for them. Rebuilds
    // are offline maintenance (like FAISS retrains), not atomic swaps.
    val fs = graft.tables.TableMeta.fs(
      spark.sparkContext.hadoopConfiguration, warehouse)
    fs.delete(new org.apache.hadoop.fs.Path(warehouse, s"${name}_vectors"), true)
    ManagedTable.loadOrCreate(spark, warehouse, s"${name}_vectors",
      assigned.schema, Seq.empty, partitionBy = Seq("list_id"))
      .append(assigned)
    new IvfIndex(spark, warehouse, name)
  }

  def load(spark: SparkSession, warehouse: String, name: String): Option[IvfIndex] =
    ManagedTable.load(spark, warehouse, s"${name}_centroids")
      .flatMap(_ => ManagedTable.load(spark, warehouse, s"${name}_vectors"))
      .map(_ => new IvfIndex(spark, warehouse, name))
}
