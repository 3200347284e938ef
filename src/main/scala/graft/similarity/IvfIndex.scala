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
    val assigned = vectors.select(
      col(idCol).as("neighbor_id"), v.as("cv"),
      Knn.norm(v).as("cn"),
      element_at(Knn.nearestLists(v, centroids, 1), 1).as("list_id"))
    // a PQ-layered index encodes new vectors with the STORED codebooks —
    // appending un-coded rows would give them null ADC distances
    val cbs = pqCodebooks
    vectorsTable.append(
      if (cbs.isEmpty) assigned
      else ProductQuantizer.encode(
          assigned.withColumn("__unit", unit(col("cv"), col("cn"))),
          "__unit", cbs, "pq_code")
        .drop("__unit"))
  }

  /** Remove indexed vectors matching `cond` (e.g.
    * `col("neighbor_id").isin(ids: _*)` or a predicate over `cv`) — a
    * merge-on-read tombstone commit on the keyed vectors table:
    * O(matched) write, no rewrite, and every search path (plain, PQ,
    * probed) excludes the removed vectors immediately through the MoR
    * read. The tombstone carries the vector's own `list_id` partition, so
    * deletion scope stays list-local like everything else in the layout.
    * Re-adding an id later via [[addBatch]] works — the new row's higher
    * commit seq wins over the tombstone.
    */
  def removeVectors(cond: Column): Unit = vectorsTable.deleteWhere(cond)

  /** Top-k cosine neighbors per query over the probed lists only. */
  def search(queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nprobe: Int = 2): DataFrame =
    Knn.ivfTopKAssigned(
      probedScan(queries, vecCol, nprobe).select("neighbor_id", "cv", "cn", "list_id"),
      queries, centroids, idCol, vecCol, k, nprobe)

  // ------------------------------------------------------------ PQ layer

  private def pqTable = ManagedTable.load(spark, warehouse, s"${name}_pq")

  /** Stored per-subspace PQ codebooks (empty if [[buildPq]] never ran). */
  def pqCodebooks: Seq[Seq[Array[Float]]] =
    pqTable.map { t =>
      t.read().orderBy("sub_idx", "cent_idx")
        .select("sub_idx", "centroid").collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map(_._2.map(_.getSeq[Float](1).toArray).toSeq)
    }.getOrElse(Seq.empty)

  /** Attach a PQ compression layer to the index (FAISS IVFPQ): train `m`
    * per-subspace codebooks of `kPerSub` centroids on the indexed corpus,
    * store them, and rewrite the vectors table with a `pq_code` column
    * (`m` small ints per vector). One corpus rewrite — the same cost
    * class as the IVF build itself; incremental [[addBatch]] afterwards
    * encodes with the stored codebooks.
    */
  /** Unit-normalized copy of a vector column — PQ codes store DIRECTION:
    * the search contract ranks by cosine, and for unit vectors L2 order
    * IS cosine order (‖a−b‖² = 2−2·cos), so the ADC shortlist agrees
    * with the exact re-rank metric instead of being skewed by norms.
    */
  private def unit(vec: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
    transform(vec, x => (x / n).cast("float"))

  def buildPq(m: Int, kPerSub: Int, iters: Int = 5): Unit = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val normed = vectorsTable.read()
      .withColumn("__unit", unit(col("cv"), col("cn")))
    val cbs = ProductQuantizer.train(normed, "neighbor_id", "__unit",
      m, kPerSub, iters, dim)
    val rows = for ((subs, j) <- cbs.zipWithIndex; (c, i) <- subs.zipWithIndex)
      yield org.apache.spark.sql.Row(j, i, c.toSeq)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sub_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("cent_idx",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("centroid",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    ManagedTable.loadOrCreate(spark, warehouse, s"${name}_pq",
      schema, Seq("sub_idx", "cent_idx"))
      .overwrite(spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), schema))
    val encoded = ProductQuantizer.encode(
        vectorsTable.read().withColumn("__unit", unit(col("cv"), col("cn"))),
        "__unit", cbs, "pq_code")
      .drop("__unit")
    val vt = vectorsTable
    vt.evolve(encoded.schema)
    vt.overwrite(encoded)
  }

  /** IVFPQ search with exact re-rank: probe `nprobe` lists (manifest-
    * pruned scan), score candidates by asymmetric distance reading ONLY
    * the code column (at 100 TB the parquet scan never touches corpus
    * floats — m bytes-ish per candidate instead of dim·4), shortlist
    * `refine·k` per query, then re-rank the shortlist by exact cosine
    * against the fetched vectors. Output contract = [[search]]:
    * (query_id, rank, neighbor_id, cosine). Recall is governed by nprobe
    * (IVF) × codebook fidelity × refine (PQ shortlist), the standard
    * IVFPQ+refine knobs; full probe + refine ≥ list sizes reproduces
    * [[search]] exactly (spec seam).
    */
  def searchPq(queries: DataFrame, idCol: String, vecCol: String,
               k: Int, nprobe: Int = 2, refine: Int = 4): DataFrame = {
    val cbs = pqCodebooks
    require(cbs.nonEmpty, s"IVF index $name has no PQ layer (run buildPq)")
    val m = cbs.length
    val scan = probedScan(queries, vecCol, nprobe)
    // ADC stage: (neighbor_id, pq_code, list_id) only — column pruning
    // keeps corpus floats out of the scan
    val cands = scan.select("neighbor_id", "pq_code", "list_id")
    val qv = IvfIndex.requireDim(col(vecCol), dim, name)
    val qn = Knn.norm(qv)
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), qv.as("qv"), qn.as("qn"),
      // ADC table over the UNIT query, matching the unit-encoded corpus
      ProductQuantizer.adcDistTable(unit(qv, qn), cbs).as("__tbl"),
      explode(Knn.nearestLists(qv, centroids, nprobe)).as("list_id")))
    val scored = q.join(cands, "list_id")
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", ProductQuantizer.adcFold(col("__tbl"), col("pq_code"), m))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    val shortlist = scored.withColumn("__r", row_number().over(w))
      .where(col("__r") <= refine * k)
      .select("query_id", "qv", "qn", "neighbor_id")
    // refine stage: exact cosine on the shortlist only (shortlist is
    // |Q|·refine·k — broadcast side of the fetch join)
    val vecs = scan.select(col("neighbor_id"), col("cv"), col("cn"))
    val exact = shortlist.join(vecs, "neighbor_id")
      .withColumn("cosine",
        round(Knn.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact.withColumn("rank", row_number().over(wf))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

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
    // keyed on neighbor_id so [[IvfIndex.removeVectors]] is an O(matched)
    // merge-on-read tombstone, never a table rewrite; ingestion stays a
    // plain append (duplicate ids coexist, as before)
    ManagedTable.create(spark, warehouse, stageName,
      assigned.schema, Seq("neighbor_id"), partitionBy = Seq("list_id"))
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
    // a rebuild invalidates any PQ layer: the new quantizer re-assigned
    // every vector and the rebuilt table carries no codes — a stale
    // codebook table would otherwise make searchPq score null codes
    fs.delete(new Path(warehouse, s"${name}_pq"), true)
    new IvfIndex(spark, warehouse, name)
  }

  def load(spark: SparkSession, warehouse: String, name: String): Option[IvfIndex] = {
    recoverVectorsSwap(spark, warehouse, name, sweepDebris = false)
    ManagedTable.load(spark, warehouse, s"${name}_centroids")
      .flatMap(_ => ManagedTable.load(spark, warehouse, s"${name}_vectors"))
      .map(_ => new IvfIndex(spark, warehouse, name))
  }
}
