package graft.similarity

import graft.tables.ManagedTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * manifest-level partition pruning ([[ManagedTable.readPartitions]])
  * restricts the scan to those lists' file groups — at 100 TB the query
  * reads ≈ nprobe/nlist of the corpus FROM DISK, planned against one
  * manifest, not a directory walk. [[addBatch]] assigns against the
  * stored centroids (broadcast literals, map-only) and appends — an
  * O(batch) manifest commit touching only the lists the batch lands in,
  * and no retrain or rewrite happens on ingest (drift is handled like
  * FAISS handles it: rebuild when recall degrades).
  *
  * Assignment at write time also moves the per-row nearest-centroid scan
  * (nlist distance evaluations per vector) from EVERY query to ONCE per
  * ingest.
  *
  * Rebuilds ([[IvfIndex.build]] over an existing index) are ATOMIC at the
  * directory level: the new assignment is staged as a sibling table and
  * swapped in via rename (live → aside, staged → live, drop aside); a
  * crash in any window is repaired by [[IvfIndex.load]]/the next build —
  * searches see either the old index or the new one, never a half-built
  * or missing vectors table.
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

  /** Index dimensionality (from the stored quantizer). */
  def dim: Int = centroids.headOption.map(_.length).getOrElse(0)

  /** Assign new vectors against the stored centroids and append. Vectors
    * whose dimensionality differs from the quantizer's fail the WRITE
    * (codegen'd guard) instead of being silently indexed into arbitrary
    * lists — `zip_with` would null-pad a mismatch and turn every centroid
    * distance into null.
    */
  def addBatch(vectors: DataFrame, idCol: String, vecCol: String): Unit = {
    val v = IvfIndex.requireDim(col(vecCol), dim, name)
    vectorsTable.append(vectors.select(
      col(idCol).as("neighbor_id"), v.as("cv"),
      Knn.norm(v).as("cn"),
      element_at(Knn.nearestLists(v, centroids, 1), 1).as("list_id")))
  }

  /** Top-k cosine neighbors per query over the probed lists only. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nprobe: Int = 2): DataFrame =
    Knn.ivfTopKAssigned(
      probedScan(queries, vecCol, nprobe).select("neighbor_id", "cv", "cn", "list_id"),
      queries, centroids, idCol, vecCol, k, nprobe)

  /** The pruned corpus scan a `search` at `nprobe` runs: the probed list
    * set (≤ queries·nprobe ints) is resolved driver-side and pruned at
    * the MANIFEST level — only the probed lists' file groups are listed
    * or opened. Queries are broadcast-scale by contract, like every kNN
    * query side here. Also the test/capacity-planning surface (assert
    * `inputFiles` ⊆ the probed groups).
    */
  def probedScan(queries: DataFrame, vecCol: String, nprobe: Int): DataFrame = {
    val probed = queries
      .select(explode(Knn.nearestLists(
        IvfIndex.requireDim(col(vecCol), dim, name), centroids, nprobe)).as("list_id"))
      .distinct().collect().map(_.getInt(0).toString).toSet
    vectorsTable.readPartitions(t => probed.contains(t("list_id")))
  }
}

object IvfIndex {

  /** Codegen'd dimension guard: pass `v` through unchanged, or fail the
    * job with a clear message when `size(v) != dim`.
    */
  private[similarity] def requireDim(v: Column, dim: Int, name: String): Column =
    when(size(v) === dim, v).otherwise(raise_error(concat(
      lit(s"IVF index $name: vector dimension "), size(v).cast("string"),
      lit(s" does not match index dimension $dim"))))

  private def vectorsPath(warehouse: String, name: String, suffix: String = "") =
    new Path(warehouse, s"${name}_vectors$suffix")

  /** Repair any crash window of the staged rebuild swap (see [[build]]):
    *  - live missing, COMPLETE staged present → the crash hit between the
    *    two renames; finish the swap. Completeness is the re-pointed
    *    meta.name marker build() writes strictly after the staging append
    *    — a crash MID-STAGING leaves the marker un-pointed and the
    *    half-built table is never promoted (it is dropped instead).
    *  - live missing, only aside present → roll the old index back.
    *  - live present → leftover aside/staged siblings are debris from a
    *    completed or abandoned rebuild.
    *
    * Debris deletion runs only with `sweepDebris = true` — build(), the
    * single writer, passes it; [[load]] does not, so a READER loading the
    * index mid-rebuild can never delete the staging directory out from
    * under the writer's running append.
    */
  private def recoverVectorsSwap(spark: SparkSession, warehouse: String, name: String,
                                 sweepDebris: Boolean): Unit = {
    val fs = graft.tables.TableMeta.fs(spark.sparkContext.hadoopConfiguration, warehouse)
    val live = vectorsPath(warehouse, name)
    val aside = vectorsPath(warehouse, name, "__old")
    val staged = vectorsPath(warehouse, name, "__new")
    def stagedComplete: Boolean =
      graft.tables.TableMeta.read(fs, staged).exists(_.name == s"${name}_vectors")
    if (!fs.exists(live)) {
      if (fs.exists(staged) && stagedComplete) fs.rename(staged, live)
      else if (fs.exists(aside)) fs.rename(aside, live)
    }
    if (sweepDebris && fs.exists(live)) { // re-check: the renames may have run
      fs.delete(aside, true)
      fs.delete(staged, true)
    }
  }

  /** Train the coarse quantizer on `corpus` and materialize both tables.
    * `nlist` ≈ √N is the usual sizing; `iters` Lloyd rounds.
    *
    * A REBUILD (the drift remedy) must replace, never append — appending
    * would leave every vector duplicated under list ids the new quantizer
    * never probes for them. The replacement is staged and swapped via
    * rename, so a concurrent/crashed rebuild leaves the OLD index intact
    * and readable rather than deleted (see [[recoverVectorsSwap]]).
    */
  def build(spark: SparkSession, warehouse: String, name: String,
            corpus: DataFrame, idCol: String, vecCol: String,
            nlist: Int, iters: Int = 5): IvfIndex = {
    recoverVectorsSwap(spark, warehouse, name, sweepDebris = true) // single writer
    val cents = KMeans.train(corpus, idCol, vecCol, nlist, iters)
    val dim = cents.headOption.map(_.length).getOrElse(0)
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

    val guarded = requireDim(col(vecCol), dim, name)
    val assigned = corpus.select(
      col(idCol).as("neighbor_id"), guarded.as("cv"),
      Knn.norm(guarded).as("cn"),
      element_at(Knn.nearestLists(guarded, cents, 1), 1).as("list_id"))
    // stage the full replacement as a sibling table, then rename-swap
    val fs = graft.tables.TableMeta.fs(
      spark.sparkContext.hadoopConfiguration, warehouse)
    val stageName = s"${name}_vectors__new"
    val stageDir = vectorsPath(warehouse, name, "__new")
    fs.delete(stageDir, true)
    ManagedTable.create(spark, warehouse, stageName,
      assigned.schema, Seq.empty, partitionBy = Seq("list_id"))
      .append(assigned)
    // the staged table is complete: re-point its metadata at the FINAL
    // name before any rename (ManagedTable resolves its directory from
    // meta.name), so every recovery window sees a self-consistent table
    val stagedMeta = graft.tables.TableMeta.read(fs, stageDir).get
    graft.tables.TableMeta.write(fs, stageDir, stagedMeta.copy(name = s"${name}_vectors"))
    val live = vectorsPath(warehouse, name)
    val aside = vectorsPath(warehouse, name, "__old")
    fs.delete(aside, true)
    if (fs.exists(live) && !fs.rename(live, aside))
      throw new java.io.IOException(s"IVF rebuild: failed to set aside $live")
    if (!fs.rename(stageDir, live)) {
      fs.rename(aside, live) // best-effort rollback
      throw new java.io.IOException(s"IVF rebuild: failed to swap in $live")
    }
    fs.delete(aside, true)
    new IvfIndex(spark, warehouse, name)
  }

  def load(spark: SparkSession, warehouse: String, name: String): Option[IvfIndex] = {
    recoverVectorsSwap(spark, warehouse, name, sweepDebris = false)
    ManagedTable.load(spark, warehouse, s"${name}_centroids")
      .flatMap(_ => ManagedTable.load(spark, warehouse, s"${name}_vectors"))
      .map(_ => new IvfIndex(spark, warehouse, name))
  }
}
