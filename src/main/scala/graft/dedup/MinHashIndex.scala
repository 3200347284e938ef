package graft.dedup

import graft.tables.ManagedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted, incrementally-maintained MinHash signature index.
  *
  * The one-shot [[MinHashLSH.candidatePairs]] re-signs the WHOLE corpus
  * every run — at 100 TB, signatures must be computed once, stored, and
  * probed. This index keeps them in a [[ManagedTable]] (`doc_id`,
  * `sig_0..sig_{k-1}`), with the hash family parameters pinned as table
  * properties so every batch ever added bands identically:
  *
  *  - [[addBatch]] signs ONLY the incoming documents (one pass over the
  *    batch) and appends signatures for ids not yet indexed — O(batch)
  *    signing plus one id anti-join against the stored table's pruned
  *    id column.
  *  - [[candidatePairs]] probes a new batch against the index BEFORE it
  *    is added: banded equi-join of the batch's band hashes against the
  *    stored corpus's (plus the batch's own, for new-new pairs). The
  *    batch side is micro-batch-scale, so AQE broadcasts it and the
  *    corpus is streamed through the join probe — the corpus is never
  *    self-joined and never re-signed.
  *
  * The ingest gate this enables (see [[graft.streaming.CorpusIngest]]
  * for the exact-hash analogue): pairs = index.candidatePairs(batch);
  * drop batch docs with a pair into the corpus; index.addBatch(rest).
  *
  * Cf. the reference's stance that dedup is an upstream concern
  * (docs/faq.md) — this is the piece a training-data pipeline actually
  * needs at scale, maintained with the same table machinery as the data.
  */
final class MinHashIndex private (val table: ManagedTable) {

  def k: Int = table.meta.properties("minhash.k").toInt
  def bands: Int = table.meta.properties("minhash.bands").toInt
  def shingleSize: Int = table.meta.properties("minhash.shingle-size").toInt

  /** Stored signatures (doc_id, sig_0..sig_{k-1}). */
  def signatures: DataFrame = table.read()

  /** Sign `docs` and append signatures for ids not yet indexed. Documents
    * shorter than the shingle size have no signature and are skipped
    * (same contract as [[MinHashLSH.signatures]]). Returns the number of
    * newly indexed documents.
    */
  def addBatch(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): Long =
    addBatchSigned(signBatch(docs, textCol, idCol))

  /** Sign a batch ONCE for both [[candidatePairsSigned]] and
    * [[addBatchSigned]] — the probe-then-add ingest gate should not pay
    * the shingle+md5 pipeline twice. The repartition is the same exchange
    * barrier the one-shot path uses: without it the band explode inlines
    * the whole signature pipeline into every band column (bands× the
    * signing cost per document).
    */
  def signBatch(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame =
    MinHashLSH.signatures(docs, textCol, idCol, k, shingleSize)
      .withColumnRenamed(idCol, "doc_id")
      .repartition(col("doc_id"))

  /** Append already-signed rows ([[signBatch]] output) for unseen ids. */
  def addBatchSigned(sigs: DataFrame): Long = {
    val fresh = sigs.join(table.read().select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = true) // sever the self-reference before the append
    table.append(fresh)
    fresh.count()
  }

  /** Candidate near-duplicate pairs of `newDocs` against the indexed
    * corpus AND among themselves — run BEFORE [[addBatch]] so the batch
    * is not probed against itself twice. Output: (id_a < id_b), distinct.
    * `maxBucketSize` caps the CORPUS side per (band, hash) bucket — the
    * same hot-bucket guard as the one-shot path.
    */
  def candidatePairs(newDocs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id",
                     maxBucketSize: Option[Int] = None): DataFrame =
    candidatePairsSigned(signBatch(newDocs, textCol, idCol), maxBucketSize)

  /** [[candidatePairs]] over pre-signed rows ([[signBatch]]) — the ingest
    * gate signs once and shares the signatures with [[addBatchSigned]].
    */
  def candidatePairsSigned(newSigs: DataFrame,
                           maxBucketSize: Option[Int] = None): DataFrame = {
    // the probe bands feed BOTH the join's probe side and the target
    // union below; unmaterialized, the batch's signing pipeline executed
    // twice (round 11). Batch-band-sized — trickle-scale by this class's
    // design — so the eager materialization is cheap at any corpus size.
    val probe = MinHashLSH.bandHashes(newSigs, "doc_id", k, bands)
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("__probe_id"))
      .localCheckpoint(true)
    val corpusBands = MinHashLSH.bandHashes(table.read(), "doc_id", k, bands)
    val capped = maxBucketSize match {
      case Some(cap) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))
        corpusBands.withColumn("__bucket_n", count(lit(1)).over(w))
          .where(col("__bucket_n") <= cap).drop("__bucket_n")
      case None => corpusBands
    }
    val target = capped
      .unionByName(probe.select(col("band_idx"), col("band_hash"),
        col("__probe_id").as("doc_id")))
      .select(col("band_idx"), col("band_hash"), col("doc_id").as("__target_id"))
    probe.join(target, Seq("band_idx", "band_hash"))
      .where(col("__probe_id") =!= col("__target_id"))
      .select(least(col("__probe_id"), col("__target_id")).as("id_a"),
        greatest(col("__probe_id"), col("__target_id")).as("id_b"))
      .distinct()
  }
}

object MinHashIndex {

  private def sigSchema(k: Int): StructType = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      (0 until k).map(i => StructField(s"sig_$i", LongType, nullable = true)))

  def create(spark: SparkSession, warehouse: String, name: String,
             k: Int = 16, bands: Int = 8, shingleSize: Int = 3): MinHashIndex = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    new MinHashIndex(ManagedTable.create(spark, warehouse, name, sigSchema(k),
      identifierFields = Seq("doc_id"),
      properties = Map(
        "minhash.k" -> k.toString,
        "minhash.bands" -> bands.toString,
        "minhash.shingle-size" -> shingleSize.toString)))
  }

  def load(spark: SparkSession, warehouse: String, name: String): Option[MinHashIndex] =
    ManagedTable.load(spark, warehouse, name)
      .filter(_.meta.properties.contains("minhash.k"))
      .map(new MinHashIndex(_))
}
