package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * A 100 TB corpus is sampled and split by *content-stable hashing*, never
  * by `rand()`: the decision for a row must survive re-runs, executor
  * retries, repartitioning, and engine changes, or downstream training
  * sets silently drift (and a train/test split leaks). Every operator here
  * derives its keep/assign decision from `md5(seed || key)` — reproducible
  * bit-for-bit in any engine with md5 (the DuckDB oracle replays it
  * verbatim), independent of row order and partitioning.
  *
  * Scale shape: [[hashSample]] and [[assignSplit]] are map-only (filter /
  * projection over the scan — no shuffle, no state, trivially parallel at
  * any width). [[stratifiedFixed]] is one hash-partition shuffle of the
  * strata key (the deterministic analogue of per-stratum reservoir
  * sampling); its per-stratum top-k never materializes a stratum on one
  * executor beyond the window sort, and skewed strata spill like any sort.
  *
  * The per-key decision space is the first 8 hex chars of md5 (32 bits)
  * reduced mod 10_000 — basis-point granularity (0.01%).
  */
object Sampling {

  /** Deterministic bucket in [0, 10000) from the string form of a key,
    * optionally salted: different seeds give independent samples.
    */
  def bucket(key: Column, seed: String = ""): Column =
    conv(substring(md5(concat(lit(seed), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10000

  /** Bernoulli-style deterministic sample: keep rows whose key hashes into
    * the first `fractionBp` basis points (1 bp = 0.01%). Map-only.
    */
  def hashSample(df: DataFrame, keyCol: String, fractionBp: Int,
                 seed: String = ""): DataFrame = {
    require(fractionBp >= 0 && fractionBp <= 10000, s"fractionBp out of range: $fractionBp")
    df.filter(bucket(col(keyCol), seed) < fractionBp)
  }

  /** Deterministic train/validation/test assignment. `cuts` are cumulative
    * bucket thresholds in basis points, e.g. `Seq(("test", 1000),
    * ("validation", 2000))` → buckets [0,1000) test, [1000,2000)
    * validation, rest train. Same key ⇒ same split, forever — the property
    * that prevents train/test leakage across pipeline re-runs.
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  cuts: Seq[(String, Int)], trainLabel: String = "train",
                  seed: String = ""): DataFrame = {
    require(cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must be ascending")
    val b = bucket(col(keyCol), seed)
    val expr = cuts.foldRight(lit(trainLabel): Column) {
      case ((label, cut), rest) => when(b < cut, label).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe split: hash the near-duplicate CLUSTER, not the
    * document, so a cluster's members always land in the same split —
    * per-document hashing lets a test doc's near-duplicate train the
    * model, which silently inflates eval (the classic contamination bug
    * dedup clustering exists to prevent).
    *
    * `clusters` is the (`idCol`, `clusterCol`) assignment from
    * [[graft.dedup.ConnectedComponents]] — diff-sized (only documents
    * that HAVE a near-dup appear), so the left join broadcasts under AQE
    * and the corpus scan never shuffles. Unclustered documents hash
    * their own id — identical to [[assignSplit]] for them.
    */
  def assignSplitByCluster(df: DataFrame, idCol: String,
                           clusters: DataFrame, clusterIdCol: String, clusterCol: String,
                           cuts: Seq[(String, Int)], trainLabel: String = "train",
                           seed: String = ""): DataFrame = {
    val c = clusters.select(col(clusterIdCol).as(idCol), col(clusterCol).as("__grp"))
    val grouped = df.join(c, Seq(idCol), "left")
      .withColumn("__grp", coalesce(col("__grp"), col(idCol)))
    assignSplit(grouped, "__grp", cuts, trainLabel, seed).drop("__grp")
  }

  /** Pretraining data-mixture sampling: per-source deterministic keep
    * rates in basis points — the "source mixing weights" step of corpus
    * assembly (a Pile/LLaMA-style mixture re-weights crawl vs books vs
    * code by downsampling the over-represented sources). Map-only: the
    * threshold is a literal when-chain on the group column and the keep
    * decision reuses the content-stable bucket hash, so the mixture is
    * reproducible across runs, engines, and partitionings like every
    * sampler here. Unlisted groups fall back to `defaultBp`.
    */
  def sampleByRates(df: DataFrame, groupCol: String, keyCol: String,
                    ratesBp: Map[String, Int], defaultBp: Int = 10000,
                    seed: String = ""): DataFrame = {
    require((ratesBp.values.toSeq :+ defaultBp).forall(r => r >= 0 && r <= 10000),
      s"rates out of basis-point range: $ratesBp default=$defaultBp")
    val thr = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp): Column) {
      case (acc, (g, r)) => when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    df.filter(bucket(col(keyCol), seed) < thr)
  }

  /** Deterministic WEIGHTED sampling: each row's keep probability scales
    * with its weight — `keep iff bucket(key) < weight · baseBp`, capped at
    * certainty. The quality-weighted retention step of a curation recipe
    * (keep 5% of junk, 100% of gold) as a pure map: same content ⇒ same
    * verdict on every re-run, no RNG state, no shuffle, any scale.
    * Weights are clamped at 0; weight 1 ≡ [[hashSample]] at `baseBp`.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     baseBp: Int, seed: String = ""): DataFrame = {
    require(baseBp >= 0 && baseBp <= 10000, s"baseBp out of range: $baseBp")
    val thr = least(lit(10000.0), greatest(lit(0.0),
      col(weightCol).cast("double") * baseBp))
    df.filter(bucket(col(keyCol), seed) < thr)
  }

  /** Mixture with UPSAMPLING — the "epochs per source" half of a data
    * recipe ([[sampleByRates]] is the downsampling half): each source's
    * rows repeat `factor` times, the fractional epoch resolved
    * deterministically per key (`bucket < frac·10000`), with the epoch
    * index exposed for downstream global shuffling. A pure map-side
    * `explode(sequence(...))` — output size is the only cost, there is no
    * shuffle and no RNG state at any corpus size.
    */
  def upsampleByFactors(df: DataFrame, groupCol: String, keyCol: String,
                        factors: Map[String, Double], defaultFactor: Double = 1.0,
                        seed: String = "", epochCol: String = "__epoch"): DataFrame = {
    require((factors.values.toSeq :+ defaultFactor).forall(f => f >= 0 && f <= 100),
      s"factors out of [0,100]: $factors default=$defaultFactor")
    val f = factors.toSeq.sortBy(_._1).foldLeft(lit(defaultFactor): Column) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val whole = floor(f).cast("int")
    val extra = (bucket(col(keyCol), seed) < (f - floor(f)) * 10000).cast("int")
    val repeats = (whole + extra).cast("int")
    // sequence(1, 0) would COUNT DOWN ([1,0]) — an explicit empty array
    // drops zero-repeat rows instead (explode of [] emits nothing)
    val epochs = when(repeats >= 1, sequence(lit(1), repeats))
      .otherwise(array().cast("array<int>"))
    df.withColumn(epochCol, explode(epochs))
  }

  /** Temperature-flattened mixture rates from the observed source counts
    * (the multilingual-pretraining recipe: sampling share ∝ countᵀ, so
    * T=1 keeps the natural distribution and T→0 flattens toward
    * uniform). Keep rate per source ∝ count^(T−1), normalized so the
    * rarest source keeps everything (10000 bp) and larger sources scale
    * down. One metadata-scale count aggregate (#sources rows) feeds
    * [[sampleByRates]].
    */
  def temperatureRatesBp(df: DataFrame, groupCol: String,
                         temperature: Double): Map[String, Int] = {
    require(temperature > 0 && temperature <= 1, s"temperature out of (0,1]: $temperature")
    // metadata-scale by construction: one row per SOURCE (the mixture's
    // corpus list, tens not millions), never per document — the collect
    // moves #sources rows, same class as its sqrtUpsampleRates sibling
    val counts = df.groupBy(col(groupCol)).count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val raw = counts.map { case (g, c) => g -> math.pow(c.toDouble, temperature - 1.0) }
    val mx = raw.values.max
    raw.map { case (g, v) => g -> math.round(v / mx * 10000).toInt }
  }

  /** Square-root temperature upsampling with DATA-DERIVED factors — the
    * UniMax-flavored mixture step: every source is upsampled toward the
    * LARGEST source by `factor = sqrt(count_max / count_s)` (T = 0.5 in
    * share ∝ countᵀ terms), so rare sources gain representation without
    * any hand-written rate table. Factors come from one metadata-scale
    * count aggregate broadcast-joined back (no driver collect, unlike
    * [[temperatureRatesBp]]); the fractional epoch resolves per key with
    * the deterministic bucket, exactly like [[upsampleByFactors]].
    *
    * sqrt (not pow) on purpose: IEEE-754 specifies sqrt as correctly
    * rounded, so an external system recomputing the factors —
    * the DuckDB oracle does — lands on bit-identical doubles; pow
    * carries no such guarantee across libm implementations.
    */
  def temperatureUpsample(df: DataFrame, groupCol: String, keyCol: String,
                          seed: String = "", epochCol: String = "__epoch",
                          factorCap: Double = 100.0): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__gn"))
    // count_max via a global window over the COUNTS relation, not a
    // second aggregate branch: `counts` consumed twice re-executed the
    // corpus count scan twice (round 11, guide §1.2). The window's single
    // partition holds one row per SOURCE — tens, by the mixture
    // contract — so the gather is metadata-scale at any corpus size.
    val factors = counts
      .withColumn("__gmax", max("__gn").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("__gf", least(lit(factorCap),
        sqrt(col("__gmax").cast("double") / col("__gn").cast("double"))))
      .select(col(groupCol).as("__tg"), col("__gf"))
    // null-safe group match: a NULL group is a real group with a real
    // count/factor (an inner equi-join would silently drop its rows)
    val joined = df.join(broadcast(factors), col(groupCol) <=> col("__tg"))
      .drop("__tg")
    val whole = floor(col("__gf")).cast("int")
    val extra = (bucket(col(keyCol), seed) <
      floor((col("__gf") - floor(col("__gf"))) * 10000)).cast("int")
    val repeats = (whole + extra).cast("int")
    val epochs = when(repeats >= 1, sequence(lit(1), repeats))
      .otherwise(array().cast("array<int>"))
    joined.withColumn(epochCol, explode(epochs)).drop("__gf")
  }

  /** Sequence packing: assign documents to fixed-capacity context windows —
    * the "pack short documents into 4k-token training sequences" step that
    * precedes tokenizer sharding. Documents are laid out in deterministic
    * hash order within each group (same content ⇒ same layout on re-runs,
    * like everything in this module) and the stream of tokens is cut every
    * `capacity`: a document's bin is the window its first token lands in,
    * `floor(tokens_before / capacity)`.
    *
    * Shape at scale: one hash shuffle of `groupCol` + a running sum per
    * group — the same cost as any per-group window. Packing is inherently
    * sequential *within* a group (each doc's offset depends on every
    * earlier doc), so parallelism comes from the grouping key — shard a
    * huge corpus by (source, hash-prefix of the key) if single groups grow
    * beyond one task's sort budget.
    */
  def packBins(df: DataFrame, groupCol: String, keyCol: String,
               tokCol: String, capacity: Int, seed: String = ""): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val w = Window.partitionBy(groupCol)
      .orderBy(bucket(col(keyCol), seed).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("bin",
      floor((sum(col(tokCol)).over(w) - col(tokCol)) / capacity).cast("long"))
  }

  /** Quantile-threshold filter in scale-safe form: keep the rows whose
    * DISCRETE score clears the highest threshold that still retains at
    * least `frac` of the corpus. A `percent_rank` over 100 TB would be a
    * single-partition global sort; for a low-cardinality score (the
    * quality score is 5 distinct values) the right plan is a histogram
    * aggregate (map-side partials, output = #distinct scores rows), the
    * cumulative-from-top threshold over that tiny relation, and one
    * broadcast back onto the scan — two jobs, no global sort, no collect.
    * CONTRACT: the score must be low-cardinality — the histogram (and its
    * unpartitioned window) is the distinct-value set. For continuous
    * scores use [[keepTopFractionBinned]], which bounds both by a fixed
    * bin count.
    */
  def keepTopFraction(df: DataFrame, scoreCol: String, frac: Double): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of range: $frac")
    val hist = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__n"))
    val cumW = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val thr = hist
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .filter(col("__cum") >= ceil(col("__tot") * frac))
      .agg(max(col(scoreCol)).as("__thr"))
    df.crossJoin(broadcast(thr)).filter(col(scoreCol) >= col("__thr"))
      .drop("__thr")
  }

  /** [[keepTopFraction]] for CONTINUOUS scores. The exact variant's
    * histogram is the score's distinct-value set — on a continuous score
    * (a perplexity, an embedding-based quality model) that relation is
    * corpus-sized and its unpartitioned cumulative window becomes a
    * single-reducer sort of the whole corpus. Here the score is first
    * quantized into `bins` fixed-width buckets between its observed min
    * and max (one map-side-partial aggregate), so the histogram and its
    * window are bounded by `bins` regardless of corpus size; the kept set
    * is every row at or above the highest bin whose from-the-top
    * cumulative count still reaches `frac`. Retention is therefore
    * ≥ `frac`, overshooting by at most one bin's mass (≈ N/bins on a
    * smooth score) — the documented trade for never sorting the corpus.
    * Null scores are dropped, like rows below the exact variant's
    * threshold.
    */
  /** [[keepTopFraction]] with the discrete/continuous routing decided by
    * the DATA, not the caller: one `approx_count_distinct` probe (a
    * map-side-partial aggregate, the cheapest whole-column statistic)
    * picks the exact histogram path while the score's NDV fits the bin
    * budget and the quantized [[keepTopFractionBinned]] path beyond it.
    * This is the safe default for scores whose cardinality the caller
    * can't bound up front (a ratio-valued quality score is discrete on
    * one corpus and near-continuous on another): the exact variant's
    * histogram is the distinct-value set, and its unpartitioned
    * cumulative window degrades toward a corpus-sized single-reducer
    * sort exactly when NDV grows — the one plan shape that cannot
    * survive a 100× scale-up. The probe costs one extra scan of the
    * score column; callers that already know the score is discrete
    * (enums, small int grades) can call [[keepTopFraction]] directly
    * and skip it.
    */
  def keepTopFractionAuto(df: DataFrame, scoreCol: String, frac: Double,
                          bins: Int = 8192): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of range: $frac")
    require(bins >= 2, s"bins must be >= 2: $bins")
    // One stats pass serves both routes: the NDV decides the path, and
    // min/max feed the binned variant directly so it skips its own
    // bounds pass — either way the total is stats + histogram + filter,
    // three scans, the same count as calling binned directly.
    val stats = df.agg(approx_count_distinct(col(scoreCol)).as("__ndv"),
      min(col(scoreCol)).cast("double").as("__mn"),
      max(col(scoreCol)).cast("double").as("__mx")).head()
    // routing must be DETERMINISTIC per dataset: the two variants keep
    // different row sets, so an HLL estimate flapping across the boundary
    // (default rsd ≈ 2–5%) would flip results between runs on a corpus
    // whose true NDV sits near `bins`. Clear calls route on the estimate;
    // inside the estimate's error band the tie-break is ONE exact
    // distinct-count scan — paid only in the narrow band where the
    // estimate cannot be trusted.
    val ndvSmall =
      if (stats.isNullAt(0)) true
      else {
        val approx = stats.getLong(0)
        if (approx <= (bins * 0.92).toLong) true
        else if (approx > (bins * 1.08).toLong) false
        else df.agg(count_distinct(col(scoreCol))).head().getLong(0) <= bins
      }
    if (ndvSmall) keepTopFraction(df, scoreCol, frac)
    else keepTopFractionBinnedWithBounds(df, scoreCol, frac, bins,
      stats.getDouble(1), stats.getDouble(2))
  }

  def keepTopFractionBinned(df: DataFrame, scoreCol: String, frac: Double,
                            bins: Int = 8192): DataFrame = {
    require(frac > 0 && frac <= 1, s"frac out of range: $frac")
    require(bins >= 2, s"bins must be >= 2: $bins")
    keepTopFractionBinnedCore(df, scoreCol, frac, bins, bounds = None)
  }

  /** [[keepTopFractionBinned]] with the score bounds already known (the
    * [[keepTopFractionAuto]] seam: its routing stats pass computes exact
    * min/max anyway, so the binned route must not re-scan for them).
    */
  private[graft] def keepTopFractionBinnedWithBounds(
      df: DataFrame, scoreCol: String, frac: Double, bins: Int,
      mn: Double, mx: Double): DataFrame =
    keepTopFractionBinnedCore(df, scoreCol, frac, bins, bounds = Some((mn, mx)))

  private def keepTopFractionBinnedCore(
      df: DataFrame, scoreCol: String, frac: Double, bins: Int,
      bounds: Option[(Double, Double)]): DataFrame = {
    // drop null scores up front (the exact variant's `score >= thr` drops
    // them implicitly) — left in, `least` would skip the NULL bin expr
    // and park them in the TOP bin: retained forever AND inflating the
    // top bin's mass against the threshold
    val scored = df.filter(col(scoreCol).isNotNull)
    // bounds as plan literals when precomputed, else a broadcast 1-row
    // relation — identical bin arithmetic either way (min/max are exact)
    val withMm = bounds match {
      case Some((mn, mx)) =>
        scored.withColumn("__mn", lit(mn)).withColumn("__mx", lit(mx))
      case None =>
        scored.crossJoin(broadcast(
          scored.agg(min(col(scoreCol)).cast("double").as("__mn"),
            max(col(scoreCol)).cast("double").as("__mx"))))
    }
    // constant scores (or a single row) degenerate to bin 0 = keep all
    val binned = withMm
      .withColumn("__bin",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((col(scoreCol).cast("double") - col("__mn")) /
              ((col("__mx") - col("__mn")) / bins)).cast("int"))))
    val hist = binned.groupBy(col("__bin")).agg(count(lit(1)).as("__n"))
    val cumW = Window.orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val thr = hist
      .withColumn("__cum", sum(col("__n")).over(cumW))
      .withColumn("__tot", sum(col("__n")).over(totW))
      .filter(col("__cum") >= ceil(col("__tot") * frac))
      .agg(max(col("__bin")).as("__thr"))
    binned.crossJoin(broadcast(thr)).filter(col("__bin") >= col("__thr"))
      .drop("__bin", "__mn", "__mx", "__thr")
  }

  /** Budget-bounded greedy selection — "take the best documents until the
    * token budget is spent", the corpus-assembly cut that turns a scored
    * crawl into a fixed-size training set. Rows are ranked by
    * (`scoreCol` desc, `tieCol` asc) and kept while the running `costCol`
    * sum stays ≤ `budget`; the output carries the inclusive running cost
    * as `cum_cost`.
    *
    * Shape at scale (the [[graft.operators.GlobalOrder]] seam, running
    * SUM instead of count): one range exchange on the rank key, an
    * in-partition sort, then per-partition cost totals collected in a
    * lightweight job over the SAME shuffled RDD (map output reused, not
    * recomputed — #partitions longs to the driver, never rows). Each
    * partition streams with its prefix offset and STOPS at the budget;
    * partitions whose offset already exceeds it emit nothing without
    * consuming input. A `sum(...) OVER (ORDER BY …)` window plans a
    * single-partition sort of the corpus — this stays fully parallel.
    *
    * Deterministic iff (`scoreCol`, `tieCol`) is unique per row.
    */
  def takeByBudget(df: DataFrame, scoreCol: String, costCol: String,
                   budget: Long, tieCol: String,
                   numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val spark = df.sparkSession
    val ordered = Seq(col(scoreCol).desc, col(tieCol).asc)
    val ranged =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, ordered: _*)
       else df.repartitionByRange(ordered: _*))
        .sortWithinPartitions(ordered: _*)
    val costIdx = ranged.schema.fieldIndex(costCol)
    def costOf(r: Row): Long = r.get(costIdx) match {
      case null => 0L
      case n: java.lang.Number =>
        val c = n.longValue()
        // the early-stop and the offset-based partition skip both assume a
        // monotone running sum — a negative cost would silently diverge
        // from the cumsum-window definition instead of erroring
        if (c < 0) throw new IllegalArgumentException(
          s"cost column $costCol must be non-negative, found $c")
        c
      case other => throw new IllegalArgumentException(
        s"cost column $costCol must be numeric, found ${other.getClass}")
    }
    val rdd = ranged.rdd // shared lineage: the sums job reuses the range-shuffle output
    val partSums = rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        Iterator.single(pid -> it.foldLeft(0L)(_ + costOf(_)))
      }.collect().toMap
    val offsets = (0 until partSums.size).scanLeft(0L)((acc, pid) => acc + partSums(pid))
    val cumIdx = ranged.schema.length // index of the appended cum_cost field
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val start = offsets(pid)
      if (start > budget) Iterator.empty // earlier partitions already spent the budget
      else {
        var cum = start
        it.map { r => cum += costOf(r); Row.fromSeq(r.toSeq :+ cum) }
          .takeWhile(_.getLong(cumIdx) <= budget)
      }
    }
    spark.createDataFrame(out, ranged.schema.add("cum_cost", LongType, nullable = false))
  }

  /** Fixed-size per-stratum sample: the k rows of each stratum whose keys
    * hash lowest (ties broken by the key itself). One shuffle on the
    * strata columns; deterministic against any input order — the scalable
    * stand-in for per-group reservoir sampling.
    */
  def stratifiedFixed(df: DataFrame, strataCols: Seq[String], keyCol: String,
                      k: Int, seed: String = ""): DataFrame = {
    require(strataCols.nonEmpty, "stratifiedFixed needs at least one stratum column")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(bucket(col(keyCol), seed).asc, col(keyCol).asc)
    df.withColumn("__sample_rank", row_number().over(w))
      .filter(col("__sample_rank") <= k)
      .drop("__sample_rank")
  }
}
