package graft.ops

import graft.{Queries, SharedSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: correctness tests prove the small-SF answer;
  * these prove the plan is the one we'd want at 100 TB — filters reaching
  * the parquet scan, column pruning, broadcast where a side is small, and
  * no accidental O(n²) join strategies in the dedup family.
  */
class PlanShapeSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  private def plan(q: Queries.Q): String =
    q.fn(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_overlap_join_binned: equi-join on (key, bin), never a nested loop") {
    val p = plan(Queries.qOverlapJoinBinned)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("sample_temperature: data-derived factors broadcast back to the corpus") {
    val p = plan(Queries.sampleTemperature)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dedup_url: canonicalize is map-side into one hash aggregation, no join") {
    val p = plan(Queries.dedupUrl)
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("cohort/transition queries: aggregation plans, no cartesian") {
    for (q <- Seq(Queries.qRetentionCohort, Queries.qEventTransitions)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), s"${q.name}:\n$p")
    }
  }

  test("q1_agg: shipdate filter is pushed to the parquet scan") {
    val p = plan(Queries.q1Agg)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThanOrEqual(l_shipdate"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("fn_string: scan reads only the referenced columns") {
    val p = plan(Queries.fnString)
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("n_chars"), s"n_chars not pruned: $read")
  }

  test("q_join_dims: dimension joins broadcast (no fact shuffle)") {
    val p = plan(Queries.qJoinDims)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("dedup family: no cartesian products") {
    for (q <- Seq(Queries.dedupJaccard, Queries.dedupMinhashPairs, Queries.dedupEmbedding)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"${q.name} has a cartesian product")
    }
  }

  test("knn brute force: the deliberate cross join broadcasts the query side") {
    val p = plan(Queries.knnBrute)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_asof_join: single hash exchange on the key, no join explosion") {
    val p = plan(Queries.qAsofJoin)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the as-of itself is window-based: expect a Window over (user_id)
    assert(p.contains("Window"), p)
  }

  test("cdc_scd2_history: one key exchange feeds the interval window, no join") {
    val p = plan(Queries.cdcScd2)
    assert(!p.contains("Join"), p)
    val exchanges = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning"), p)
    assert(p.contains("Window"), p)
  }

  test("cdc_snapshot_as_of: partial-aggregated max_by, no window, no join") {
    val p = plan(Queries.cdcSnapshotAsOf)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // map-side partial before the key exchange: two aggregate nodes
    val aggs = p.linesIterator.count(_.matches("""^\(\d+\) (Hash|ObjectHash|Sort)Aggregate\s*$"""))
    assert(aggs == 2, s"expected partial+final aggregate, got $aggs:\n$p")
  }

  test("cdc_reconcile_states: full-outer merge join, no cartesian, diff-sized output") {
    val p = plan(Queries.cdcReconcile)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("FullOuter"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("whole-stage codegen covers the scalar conversion path") {
    val p = plan(Queries.fnTemporal)
    assert(p.contains("WholeStageCodegen") || p.contains("codegen id"), p)
  }

  test("sampling: hash sample and split are map-only (no exchange) with pruned scans") {
    for (q <- Seq(Queries.sampleHash)) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"${q.name} should not shuffle:\n$p")
      val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!read.contains("text"), s"text not pruned from ${q.name}: $read")
    }
    // the split ASSIGNMENT itself (pre-aggregation — the sample_split query
    // adds a groupBy on top) must also be a pure projection over the scan
    val assignPlan = graft.sampling.Sampling.assignSplit(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id",
      Seq(("test", 1000), ("validation", 2000)))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!assignPlan.contains("Exchange"), s"assignSplit should not shuffle:\n$assignPlan")
  }

  test("pipeline_curation: filters fuse into the scan stage; only the dedup window shuffles") {
    val p = plan(Queries.pipelineCuration)
    // count detail headers "(N) Exchange" — the tree section repeats nodes
    val exchanges = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
    assert(exchanges == 1, s"expected exactly the dedup-window exchange, got $exchanges:\n$p")
    assert(p.contains("WindowGroupLimit"), "per-fingerprint top-1 should push a group limit")
  }

  test("upsert anti-join: no forced broadcast hint; AQE still broadcasts trickle batches") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val target = spark.range(0, 50000)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        lit("c").as("__op"), lit(1L).as("__source_ts_ns"))
    val batch = spark.range(0, 10)
      .select(col("id"), concat(lit("u"), col("id")).as("name"),
        lit("u").as("__op"), lit(2L).as("__source_ts_ns"))
    val merged = graft.cdc.CdcApply.upsert(target, batch, Seq("id"),
      graft.cdc.CdcApply.UpsertConfig(dedupColumn = "__source_ts_ns"))
    // 1. the logical plan carries NO broadcast hint — a table-scale backfill
    //    batch must be free to shuffle instead of OOMing the driver
    val hinted = merged.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint != JoinHint.NONE => j
    }
    assert(hinted.isEmpty, s"forced join hint present: $hinted")
    // 2. ...while AQE still turns the trickle-batch anti-join into a
    //    broadcast at runtime from observed sizes
    assert(merged.count() == 50000)
    val executed = merged.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin") && executed.contains("LeftAnti"),
      executed.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("MoR read: trickle upsert groups broadcast; base scan never shuffled; delete side column-pruned") {
    import org.apache.spark.sql.functions._
    val wh = java.nio.file.Files.createTempDirectory("graft_morplan").toString
    val base = spark.range(0, 50000)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        lit("c").as("__op"), lit(1L).as("__source_ts_ns"))
    val t = graft.tables.ManagedTable.create(spark, wh, "morplan", base.schema, Seq("id"))
    t.merge(base)          // backfill: becomes the min-seq group (excluded from delete side)
    t.merge(spark.range(0, 10)
      .select(col("id"), concat(lit("u"), col("id")).as("name"),
        lit("u").as("__op"), lit(2L).as("__source_ts_ns")))  // trickle
    val df = t.read()
    assert(df.count() == 50000)
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("BroadcastHashJoin") && executed.contains("LeftAnti"),
      executed.linesIterator.filter(_.contains("Join")).mkString("\n"))
    // broadcast anti-join means the 50k-row base scan side has no exchange
    // other than the broadcast one
    assert(!executed.contains("Exchange hashpartitioning"),
      executed.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    // the delete side reads only (id, seq) — schema-pruned scan
    val delScan = executed.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("__graft_seq") && !l.contains("name"))
    assert(delScan.nonEmpty, "delete side is not column-pruned to (id, __graft_seq)")
  }

  test("pii redaction and sq8 quantization are map-only (no exchange)") {
    for (q <- Seq(Queries.textPiiRedact, Queries.embeddingQuantize)) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"${q.name} should not shuffle:\n$p")
    }
  }

  test("pipeline_packing: the group-key window is the only exchange before the final agg") {
    val p = plan(Queries.pipelinePacking)
    assert(!p.contains("CartesianProduct"), p)
    // window partitioned by source — never a global (empty-key) sort
    assert(p.contains("Window"), p)
    assert(!p.linesIterator.exists(_.matches(""".*Exchange SinglePartition.*""")),
      s"packing must not serialize to one partition:\n$p")
  }

  test("decontamination: eval gram set broadcasts at runtime; no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val flags = graft.dedup.Decontaminate.contaminationFlags(
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 97 =!= 0),
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 97 === 0),
      "doc_id", "text", n = 5)
    assert(flags.count() > 0)
    val executed = flags.queryExecution.executedPlan.toString
    assert(!executed.contains("CartesianProduct"), executed)
    assert(executed.contains("BroadcastHashJoin"),
      executed.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("text_quality_filter: threshold joins back by broadcast, never a global sort of docs") {
    val p = plan(Queries.textQualityFilter)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the only sorts allowed are inside the tiny histogram window, which
    // AQE plans as a single partition of #distinct-scores rows — the
    // document relation itself must not be globally sorted
    assert(!p.contains("rangepartitioning"), s"global sort leaked into the doc path:\n$p")
  }

  test("dedup_spans: exactly two exchanges (block hash, doc reassembly), no join") {
    val p = plan(Queries.dedupSpans)
    val exchanges = p.linesIterator.count(_.matches("""\s*\(\d+\) Exchange\s*"""))
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), "span dedup must be window+agg, not a self-join")
    // the decision window partitions by the block hash — never unpartitioned
    assert(!p.contains("SinglePartition"), s"a single-partition stage leaked in:\n$p")
  }

  test("dedup_semantic: codebook broadcasts; no cartesian pair scan across cells") {
    // round 11: the assignment relation is checkpointed (computed once
    // for the self-join's two sides and the final keep), so the final
    // plan reads it as an RDD scan; the codebook broadcast lives in the
    // assignment subtree, asserted on its own plan here.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val assignPlan = graft.dedup.SemanticDedup.assign(emb, "vec_id", "embedding",
      emb.where(org.apache.spark.sql.functions.col("vec_id") < 8),
      "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(assignPlan.contains("BroadcastExchange") ||
      assignPlan.contains("BroadcastNestedLoopJoin"), "codebook must broadcast")
    val p = plan(Queries.dedupSemantic)
    assert(p.contains("ExistingRDD"),
      s"assignment must be materialized once, not recomputed per consumer:\n$p")
    assert(!p.contains("CartesianProduct"),
      p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("dedup_incremental_bloom: batch probe is map-side; dup set broadcasts back") {
    val q = Queries.dedupIncrementalBloom
    val df = q.fn(spark, sf)
    val executed = { df.collect(); df.queryExecution.executedPlan.toString }
    // the bloom probe must appear as a plain filter predicate...
    assert(executed.contains("might_contain"), "bloom probe missing from the plan")
    // ...and the confirmed-duplicate set joins back by broadcast, so the
    // batch relation is never shuffled for the corpus comparison
    assert(executed.contains("BroadcastHashJoin"),
      executed.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("sample_global_seq: numbering comes from the partition-offset seam, not a global window") {
    val df = Queries.sampleGlobalSeq.fn(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the outer plan is the per-partition zip seam (an RDD scan) — a
    // row_number rewrite would surface as a Window over SinglePartition
    assert(p.contains("ExistingRDD"), s"offset-zip seam missing:\n$p")
    assert(!p.contains("Window"), s"global-window numbering leaked in:\n$p")
    // explicit partition counts spread the seam (SamplingSpec asserts 7);
    // with the default count AQE may legitimately coalesce tiny inputs
  }

  test("text_oov_rate: the vocabulary broadcasts; the corpus side never cartesians") {
    val p = plan(Queries.textOovRate)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"vocab not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"corpus-side shuffle/cartesian crept into the vocab join:\n$p")
  }

  test("embedding_pq_code / sampling maps: single-stage map-only plans, no exchange") {
    for (q <- Seq(Queries.embeddingPqCode, Queries.sampleWeighted, Queries.textNormalize)) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"${q.name} shuffled a map-only transform:\n$p")
    }
  }

  test("ts_gap_fill / q_gap_islands: key-local plans — no cartesian, no global window") {
    for (q <- Seq(Queries.tsGapFill, Queries.qGapIslands)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"${q.name}:\n$p")
      // every window partitions on the key — a partition-less window would
      // single-thread the fill at scale
      assert(!p.linesIterator.exists(l => l.contains("Window") && l.contains("PartitionSpec: []")),
        s"${q.name} planned a global window:\n$p")
    }
  }

  test("q_scd2_temporal_join: validity join is a key equi-join, never a nested loop") {
    val p = plan(Queries.qScd2TemporalJoin)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p)
    // the range condition must ride the equi-join, not a post-join filter
    // of a cartesian: some hash/merge join on user_id must exist
    assert(p.contains("Join") && p.contains("user_id"), p)
  }

  // ---- round-5 operators

  test("text_classifier_score: map-only — the weight fold never shuffles or joins") {
    val p = plan(Queries.textClassifierScore)
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"classifier scoring must live in the scan stage:\n$p")
  }

  test("text_html_extract: map-only regexp chain in the scan stage") {
    val p = plan(Queries.textHtmlExtract)
    assert(!p.contains("Exchange") && !p.contains("Join"), p)
  }

  test("dedup_lines: frequency agg + threshold join + one reassembly exchange, no cartesian") {
    val p = plan(Queries.dedupLines)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the boilerplate set joins back; the line relation must never
    // cross-join it
    assert(p.contains("Join"), p)
  }

  test("sample_top_frac_binned: bounded histogram plan — 1-row broadcasts, no corpus window") {
    val p = plan(Queries.sampleTopFracBinned)
    // the two cross joins are DELIBERATE 1-row broadcasts (min/max
    // bounds, threshold); the cumulative window runs over the ≤bins-row
    // histogram aggregate, never the corpus — so the plan must contain
    // the window + hash aggregates and no join besides the broadcast
    // 1-row cross shapes
    assert(p.contains("Window") && p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("agg_sketch_rollup: aggregation-only plan (sketch partials + the distinct audit), no join") {
    val p = plan(Queries.aggSketchRollup)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    // one exchange for the sketch/count aggregation, one more for the
    // exact-distinct audit column's two-phase distinct — never a third
    val exchanges = p.linesIterator.count(_.matches("""^\(\d+\) Exchange\s*$"""))
    assert(exchanges <= 2, s"expected ≤2 aggregation exchanges, got $exchanges:\n$p")
  }

  // ---- round-6 operators

  test("multimodal audio/video stats: map-only kernels behind one compute-widening exchange") {
    for (q <- Seq(Queries.multimodalAudioStats, Queries.multimodalVideoStats)) {
      val p = plan(q)
      // round 11: media kernels are compute-bound, so a narrow input is
      // widened ONCE to the core count (round-robin — the id rows are a
      // few bytes each); the codec chain itself stays one map stage. At
      // corpus scale the scan is already wide and even that exchange
      // disappears. A keyed/aggregating exchange or a join would mean the
      // kernel stopped being map-only.
      val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
      assert(exchanges <= 1, s"${q.name}: expected at most the widening exchange:\n$p")
      if (exchanges == 1)
        assert(p.contains("RoundRobinPartitioning"),
          s"${q.name}: the only exchange must be the compute widening:\n$p")
      assert(!p.contains("Join"),
        s"${q.name}: decode kernels must stay join-free:\n$p")
    }
  }

  test("text_quality_filter (auto-routed): histogram aggregate + broadcast threshold, no corpus sort") {
    val p = plan(Queries.textQualityFilter)
    // the exact path at this NDV: hash-aggregate histogram, 1-row window,
    // broadcast nested loop to attach the threshold — never a global Sort
    // of the corpus feeding a window
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
