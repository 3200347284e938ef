package graft.streaming

import graft.tables.ManagedTable
import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous corpus ingestion: the streaming composition of the curation
  * operators — documents arrive as files, are quality-gated and
  * fingerprint-deduplicated ACROSS micro-batches, and land in a
  * [[ManagedTable]] under the same all-or-retry offset contract as the
  * CDC path. This is the "always-on crawl intake" shape: the batch
  * curation queries (`pipeline_curation` etc.) re-run over a frozen
  * corpus; this pipeline keeps a growing corpus clean as it arrives.
  *
  * Per micro-batch: map-only quality scoring + fingerprinting in the scan
  * stage, one state shuffle keyed by the 64-bit fingerprint hash
  * ([[StatefulDedup]] with a constant version column = emit exactly the
  * FIRST arrival of each content, forever), then a MoR append (O(batch)
  * writes). State is hash-partitioned across executors and bounded by
  * the optional TTL — the same trade a Kafka-compaction consumer makes.
  *
  * Rejected rows are not lost silently: callers that keep a quarantine
  * audit run [[rejects]] over the same input in batch mode (the scoring
  * is deterministic, so the split is exact).
  *
  * With `nearDupIndex` set, batches additionally probe a persisted
  * [[graft.dedup.MinHashIndex]]: near-duplicates of anything already
  * landed (or of a smaller-id batch mate) are gated out, and survivors
  * extend the index — the corpus is never re-signed per batch.
  */
object CorpusIngest {

  /** Document schema of the intake stream (JSON lines per file). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  final case class Config(
      warehouse: String,
      tableName: String = "corpus",
      minQuality: Double = 0.5,
      dedupTtl: Option[String] = None,
      redactPii: Boolean = false,
      nearDupIndex: Option[String] = None,
      nearDupK: Int = 16,
      nearDupBands: Int = 8,
      nearDupShingleSize: Int = 3,
      /** Declarative row constraints ([[graft.operators.Expectations]])
        * gating intake ALONGSIDE the quality threshold — evaluated
        * map-only before the dedup state, so a rejected row never burns
        * fingerprint state. Nulls fail closed. The scoring is
        * deterministic, so [[rejects]] reproduces the quarantined rows
        * (with their violation lists) exactly in batch mode.
        */
      expectations: Seq[graft.operators.Expectations.Rule] = Seq.empty)

  /** Start the intake stream over a directory of JSON-line document
    * files. The managed table auto-creates on first batch (append-only,
    * no identifier fields — content identity is the fingerprint state's
    * job, not the table's).
    */
  def start(spark: SparkSession, inputDir: String, checkpointDir: String,
            cfg: Config, maxFilesPerTrigger: Int = 1000): StreamingQuery = {
    val raw = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
    // redaction runs BEFORE fingerprinting: two documents differing only
    // in the concrete PII they leak are the same document after release
    val redacted =
      if (cfg.redactPii) raw.withColumn("text", TextFunctions.redactPii(col("text")))
      else raw
    val scored = redacted
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
    val gated =
      if (cfg.expectations.isEmpty) scored
      else graft.operators.Expectations.annotate(scored, cfg.expectations)
        .filter(size(col("__violations")) === 0).drop("__violations")
    val keep = gated.filter(col("quality") >= cfg.minQuality)
      // emit-once-per-content: constant version ⇒ only a key's first
      // arrival is ever strictly newer than state
      .withColumn("__fpk", xxhash64(col("fingerprint")))
      .withColumn("__ver", lit(0L))
      .withColumn("__op", lit("c"))
    val deduped = StatefulDedup.dropStaleVersions(keep, "__fpk", "__ver", "__op",
        ttl = cfg.dedupTtl)
      .drop("__fpk", "__ver", "__op")
    deduped.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) => landBatch(cfg, batch, batchId) }
      .start()
  }

  /** Idempotent batch landing: the batch id is stamped into the table
    * meta ATOMICALLY with the manifest commit (one pointer flip), so a
    * replayed micro-batch — crash after the table committed but before
    * the checkpoint did — is detected and skipped instead of landing
    * twice. The foreachBatch contract is at-least-once; this marker
    * makes the table's view of it exactly-once (Iceberg sinks dedup
    * replayed commits via snapshot summaries the same way).
    */
  private[streaming] val BatchIdProp = "ingest.last-batch-id"

  private[streaming] def landBatch(cfg: Config, batch: DataFrame, batchId: Long): Unit = {
    val spk = batch.sparkSession
    val table = ManagedTable.load(spk, cfg.warehouse, cfg.tableName).getOrElse {
      ManagedTable.create(spk, cfg.warehouse, cfg.tableName, batch.schema)
    }
    val last = table.meta.properties.get(BatchIdProp).map(_.toLong).getOrElse(-1L)
    val alreadyLanded = batchId <= last
    cfg.nearDupIndex match {
      case None =>
        if (!alreadyLanded) table.append(batch, Map(BatchIdProp -> batchId.toString))
      case Some(idxName) =>
        // NEAR-dup gate on top of the exact-fingerprint state: the batch
        // probes the persisted MinHash index ([[graft.dedup.MinHashIndex]])
        // and survivors are what both the corpus and the index gain.
        // Ordering is corpus-append (with the batch-id marker) BEFORE
        // index-add: on a replay the gate recomputes against an index the
        // crashed attempt never advanced, so the survivor set is
        // identical, the marker skips the second append, and addBatch's
        // id anti-join makes the index catch-up idempotent.
        val idx = graft.dedup.MinHashIndex.load(spk, cfg.warehouse, idxName)
          .getOrElse(graft.dedup.MinHashIndex.create(spk, cfg.warehouse, idxName,
            cfg.nearDupK, cfg.nearDupBands, cfg.nearDupShingleSize))
        // sign ONCE; the same signatures feed the probe and the index add
        val sigs = idx.signBatch(batch, "text", "doc_id")
          .localCheckpoint(eager = true)
        val pairs = idx.candidatePairsSigned(sigs)
        // drop the batch side of a batch-vs-indexed pair (the corpus copy
        // wins); for an in-batch pair keep the smaller doc_id — greedy,
        // deterministic, replay-stable
        val bid = batch.select(col("doc_id")).distinct()
        val f = pairs
          .join(bid.select(col("doc_id").as("id_a")).withColumn("__ain", lit(true)),
            Seq("id_a"), "left")
          .join(bid.select(col("doc_id").as("id_b")).withColumn("__bin", lit(true)),
            Seq("id_b"), "left")
          .select(col("id_a"), col("id_b"),
            coalesce(col("__ain"), lit(false)).as("a_in"),
            coalesce(col("__bin"), lit(false)).as("b_in"))
        val rejectIds = f.select(
          when(col("a_in") && !col("b_in"), col("id_a"))
            .when(col("b_in") && !col("a_in"), col("id_b"))
            .otherwise(greatest(col("id_a"), col("id_b"))).as("doc_id"))
          .distinct()
        val survivors = batch.join(rejectIds, Seq("doc_id"), "left_anti")
          .localCheckpoint(eager = true) // one computation feeds both commits
        if (!alreadyLanded)
          table.append(survivors, Map(BatchIdProp -> batchId.toString))
        idx.addBatchSigned(
          sigs.join(survivors.select("doc_id"), Seq("doc_id"), "left_semi"))
    }
  }

  /** Batch-mode quality quarantine: the rows of `df` below the threshold,
    * scored — written by callers that keep a reject audit table.
    */
  def rejects(df: DataFrame, minQuality: Double): DataFrame =
    df.withColumn("quality", TextFunctions.qualityScore(col("text")))
      .filter(col("quality") < minQuality)

  /** Quarantine audit with expectation rules: every row the intake gate
    * drops — quality-threshold failures AND rule violations — with its
    * full violation list (the threshold surfaces as the synthetic rule
    * `min_quality`). Evaluates on RAW text; exact gate complement only
    * when redaction is off — use the `rejects(df, cfg)` overload for the
    * redaction-aware audit.
    */
  def rejects(df: DataFrame, minQuality: Double,
              rules: Seq[graft.operators.Expectations.Rule]): DataFrame = {
    val scored = df.withColumn("quality", TextFunctions.qualityScore(col("text")))
    val all = rules :+ graft.operators.Expectations.Rule("min_quality",
      col("quality") >= minQuality)
    graft.operators.Expectations.annotate(scored, all)
      .filter(size(col("__violations")) > 0)
  }

  /** Config-exact quarantine audit: applies the SAME preprocessing as
    * [[start]] — PII redaction included when configured — before scoring
    * and rules, so for a duplicate-free input this is exactly the
    * complement of what the stream lands.
    */
  def rejects(df: DataFrame, cfg: Config): DataFrame = {
    val pre =
      if (cfg.redactPii) df.withColumn("text", TextFunctions.redactPii(col("text")))
      else df
    rejects(pre, cfg.minQuality, cfg.expectations)
  }
}
