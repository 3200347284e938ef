package graft.ops

import graft.SharedSpark
import graft.sampling.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The properties that make hash sampling trustworthy in a pipeline:
  * decisions are per-key deterministic (stable across runs, partitioning,
  * and input order), splits partition the input exactly, independent seeds
  * give independent samples, and stratified top-k is a true per-stratum
  * fixed-size sample.
  */
class SamplingSpec extends AnyFunSuite with SharedSpark {

  private def docs = {
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"doc $i", if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "es"))
      .toDF("id", "text", "lang")
  }

  test("hashSample is deterministic and partitioning-invariant") {
    val a = Sampling.hashSample(docs, "id", 1000, "s").select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), "id", 1000, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    val c = Sampling.hashSample(docs.orderBy(desc("id")), "id", 1000, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b && a == c)
    // ~10% requested; md5 is uniform enough that 2000 keys land within ±50%
    assert(a.size > 100 && a.size < 300, s"got ${a.size}")
  }

  test("different seeds give different (independent) samples") {
    val a = Sampling.hashSample(docs, "id", 1000, "s1").select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "id", 1000, "s2").select("id").collect().map(_.getLong(0)).toSet
    assert(a != b)
    // independence: overlap ≈ 1% of keys, far below either sample's size
    assert((a & b).size < math.min(a.size, b.size) / 2)
  }

  test("weightedSample: keep rate scales with weight; w=1 ≡ hashSample; clamps hold") {
    import spark.implicits._
    val weighted = docs.withColumn("w",
      when(col("lang") === "en", 2.0).when(col("lang") === "de", 1.0).otherwise(0.0))
    val kept = Sampling.weightedSample(weighted, "id", "w", baseBp = 1000, seed = "s")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // es has weight 0 -> nothing; en keeps ~2x de's rate
    assert(!kept.contains("es"))
    assert(kept("en").toDouble / kept("de") > 1.4, s"rates not weight-scaled: $kept")
    // weight 1 everywhere reduces to hashSample at the same seed/rate
    val w1 = Sampling.weightedSample(docs.withColumn("w", lit(1.0)), "id", "w", 1000, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    val hs = Sampling.hashSample(docs, "id", 1000, "s")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(w1 == hs)
    // weight big enough saturates at keep-everything
    val all = Sampling.weightedSample(docs.withColumn("w", lit(100.0)), "id", "w", 1000, "s")
    assert(all.count() == docs.count())
  }

  test("upsampleByFactors: integer epochs exact, fractional epochs deterministic, zero drops") {
    import spark.implicits._
    val byLang = Sampling.upsampleByFactors(docs, "lang", "id",
      Map("en" -> 2.0, "de" -> 1.5, "es" -> 0.0), seed = "up")
    val counts = byLang.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == base("en") * 2)                 // exact integer factor
    assert(!counts.contains("es"))                         // factor 0 drops
    val ratio = counts("de").toDouble / base("de")         // ~1.5 ± hash noise
    assert(ratio > 1.3 && ratio < 1.7, s"de ratio $ratio")
    // epoch indexes are 1..reps per key
    val epochs = byLang.where(col("lang") === "en").groupBy("id")
      .agg(collect_set("__epoch").as("e")).collect()
    assert(epochs.forall(_.getSeq[Int](1).toSet == Set(1, 2)))
    // determinism: same seed, same layout, any partitioning
    val again = Sampling.upsampleByFactors(docs.repartition(17), "lang", "id",
      Map("en" -> 2.0, "de" -> 1.5, "es" -> 0.0), seed = "up")
      .select("id", "__epoch").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val first = byLang.select("id", "__epoch").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == first)
  }

  test("assignSplit partitions the input: every row exactly one label, stable per key") {
    val s = Sampling.assignSplit(docs, "id", Seq(("test", 1000), ("validation", 2000)), seed = "s")
    assert(s.count() == 2000)
    val byLabel = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("test", "validation", "train"))
    assert(byLabel.values.sum == 2000)
    // the same key must always land in the same split (re-run equality)
    val again = Sampling.assignSplit(docs.repartition(7), "id",
      Seq(("test", 1000), ("validation", 2000)), seed = "s")
    val j = s.select(col("id"), col("split").as("a"))
      .join(again.select(col("id"), col("split").as("b")), "id")
      .filter(col("a") =!= col("b")).count()
    assert(j == 0)
    // split ∩ sample consistency: the 'test' set IS hashSample at 1000bp
    val testIds = s.filter(col("split") === "test").select("id").collect().map(_.getLong(0)).toSet
    val sampled = Sampling.hashSample(docs, "id", 1000, "s").select("id").collect().map(_.getLong(0)).toSet
    assert(testIds == sampled)
  }

  test("assignSplitByCluster: cluster members never straddle splits; unclustered ≡ assignSplit") {
    import spark.implicits._
    val docs = spark.range(0, 2000).toDF("doc_id")
    // clusters pair doc k with doc k+1000 for k < 300 (canonical = k)
    val clusters = spark.range(0, 300)
      .select(col("id"), col("id").as("cluster"))
      .union(spark.range(0, 300).select((col("id") + 1000).as("id"), col("id").as("cluster")))
    val cuts = Seq(("test", 3000), ("validation", 5000))
    val out = Sampling.assignSplitByCluster(docs, "doc_id", clusters, "id", "cluster", cuts, seed = "s")
    // 1. members of the same cluster share a split
    val straddling = out
      .join(clusters.withColumnRenamed("id", "doc_id"), "doc_id")
      .groupBy("cluster").agg(countDistinct("split").as("n"))
      .where(col("n") > 1).count()
    assert(straddling == 0)
    // 2. an unclustered doc gets exactly its assignSplit label
    val plain = Sampling.assignSplit(docs.where(col("doc_id").between(300, 999)),
      "doc_id", cuts, seed = "s")
    val joined = out.where(col("doc_id").between(300, 999))
      .withColumnRenamed("split", "split_c")
      .join(plain, "doc_id")
    assert(joined.where(col("split_c") =!= col("split")).count() == 0)
    // 3. every row labeled
    assert(out.count() == 2000 && out.where(col("split").isNull).count() == 0)
  }

  test("keepTopFractionBinned: continuous score, bounded histogram, ≈frac retention") {
    import spark.implicits._
    val n = 20000
    // continuous score — every value distinct, so the EXACT variant's
    // histogram would be corpus-sized; the binned one must stay at `bins`
    val rnd = new scala.util.Random(11)
    val scored = (1 to n).map(i => (i.toLong, rnd.nextDouble() * 100.0))
      .toDF("id", "score").repartition(13)
    val bins = 512
    val kept = Sampling.keepTopFractionBinned(scored, "score", 0.25, bins)
    val k = kept.count()
    // retention ≥ frac, overshoot bounded by one bin's mass (uniform score
    // → ≈ n/bins ≈ 39; allow generous slack for density wiggle)
    assert(k >= n / 4, s"under-retained: $k")
    assert(k <= n / 4 + 4 * n / bins, s"over-retained: $k")
    // the kept set is exactly a top slice by score (threshold semantics)
    val minKept = kept.agg(min("score")).head().getDouble(0)
    assert(scored.where(col("score") > minKept).count() <= k)
    assert(scored.where(col("score") >= minKept).count() == k)
    // constant scores keep everything (degenerate width)
    val const = (1 to 100).map(i => (i.toLong, 7.5)).toDF("id", "score")
    assert(Sampling.keepTopFractionBinned(const, "score", 0.5).count() == 100)
    // null scores are dropped (the exact variant's contract) — not parked
    // in the top bin by least()'s null-skipping
    val withNulls = ((1 to 100).map(i => (i.toLong, java.lang.Double.valueOf(i.toDouble))) ++
      (101 to 140).map(i => (i.toLong, null.asInstanceOf[java.lang.Double])))
      .toDF("id", "score")
    val keptN = Sampling.keepTopFractionBinned(withNulls, "score", 0.25, 50)
    assert(keptN.where(col("score").isNull).count() == 0, "null scores retained")
    assert(keptN.count() >= 25 && keptN.count() <= 29, s"got ${keptN.count()}")
    // discrete scores: binned agrees with the exact variant when bins
    // outnumber the distinct values and bin edges can't split a value
    val disc = (1 to 1000).map(i => (i.toLong, (i % 4).toDouble)).toDF("id", "score")
    val exact = Sampling.keepTopFraction(disc, "score", 0.5)
      .select("id").as[Long].collect().toSet
    val binned = Sampling.keepTopFractionBinned(disc, "score", 0.5, 16)
      .select("id").as[Long].collect().toSet
    assert(binned == exact)
  }

  test("keepTopFractionAuto routes by NDV: exact for discrete, binned for continuous") {
    import spark.implicits._
    // discrete (4 values, bins=64): auto must take the exact path
    val disc = (1 to 1000).map(i => (i.toLong, (i % 4).toDouble)).toDF("id", "score")
    val exact = Sampling.keepTopFraction(disc, "score", 0.5)
      .select("id").as[Long].collect().toSet
    val autoD = Sampling.keepTopFractionAuto(disc, "score", 0.5, bins = 64)
      .select("id").as[Long].collect().toSet
    assert(autoD == exact, "auto on a discrete score must equal the exact variant")
    // continuous (every value distinct, NDV >> bins): auto must take the
    // binned path — identical kept set to calling binned directly, and
    // the plan's histogram/window input is the quantized __bin column
    // (bounded by `bins`), never the raw score's distinct-value set
    val rnd = new scala.util.Random(7)
    val cont = (1 to 5000).map(i => (i.toLong, rnd.nextDouble() * 10)).toDF("id", "score")
    val autoC = Sampling.keepTopFractionAuto(cont, "score", 0.25, bins = 64)
    val binnedC = Sampling.keepTopFractionBinned(cont, "score", 0.25, bins = 64)
      .select("id").as[Long].collect().toSet
    assert(autoC.select("id").as[Long].collect().toSet == binnedC,
      "auto on a continuous score must equal the binned variant")
    val windowAggs = autoC.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windowAggs.nonEmpty)
    assert(windowAggs.forall(_.collectLeaves().nonEmpty))
    // the unpartitioned cumulative window must consume the bounded bin
    // histogram: its child aggregate groups by the __bin quantization,
    // not the raw continuous score
    val windowChildAggs = autoC.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
            a.groupingExpressions.map(_.references.map(_.name).mkString(","))
        }
    }.flatten.flatten
    assert(windowChildAggs.exists(_.contains("__bin")),
      s"window must aggregate over __bin, saw: $windowChildAggs")
  }

  test("takeByBudget equals the cumsum-window definition on random data, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(13)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(100).toLong, rnd.nextInt(50) + 1L))
    for (budget <- Seq(0L, 1L, 7000L, 1000000L); parts <- Seq(1, 7)) {
      val df = rows.toDF("id", "score", "cost").repartition(parts)
      val got = Sampling.takeByBudget(df, "score", "cost", budget, "id")
        .select("id", "cum_cost").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.orderBy(col("score").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum("cost").over(w))
        .where(col("cum") <= budget)
        .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"budget=$budget parts=$parts: ${got.size} vs ${want.size}")
    }
  }

  test("takeByBudget: empty input, and partitions past the budget emit nothing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "score", "cost")
    assert(Sampling.takeByBudget(empty, "score", "cost", 100L, "id").count() == 0)
    // many range partitions, tiny budget: only the top partition contributes
    val big = spark.range(0, 100000)
      .select(col("id"), (lit(1000000L) - col("id")).as("score"), lit(10L).as("cost"))
    val out = Sampling.takeByBudget(big, "score", "cost", 55L, "id", numPartitions = 16)
      .select("id").as[Long].collect().sorted.toSeq
    assert(out == Seq(0L, 1L, 2L, 3L, 4L)) // 5 rows of cost 10 fit in 55
  }

  test("stratifiedFixed returns exactly k per stratum, order-invariant") {
    val k = 15
    val sel = Sampling.stratifiedFixed(docs, Seq("lang"), "id", k, "s")
    val sizes = sel.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.toSet == Set(k.toLong), sizes.toString)
    val shuffled = Sampling.stratifiedFixed(docs.orderBy(desc("id")).repartition(11),
      Seq("lang"), "id", k, "s")
    assert(sel.select("lang", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      shuffled.select("lang", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // strata smaller than k come back whole
    val tiny = Sampling.stratifiedFixed(docs.filter(col("id") <= 5), Seq("lang"), "id", k, "s")
    assert(tiny.count() == 5)
  }

  test("withGlobalSeq numbers 1..N in key order across many partitions") {
    import graft.operators.GlobalOrder
    val got = GlobalOrder.withGlobalSeq(docs.repartition(11), "id", "seq", numPartitions = 7)
      .select("id", "seq").collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // ids unique → sorting by id must yield seq exactly 1..N in order
    assert(got.map(_._2).toSeq == (1L to got.length).toSeq, got.take(5).mkString(","))
    // deterministic across partitioning layouts
    val again = GlobalOrder.withGlobalSeq(docs.orderBy(rand(5)).repartition(3), "id", "seq")
      .select("id", "seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, seq) => again(id) == seq })
    // the work is spread over the requested partitions, not one
    assert(GlobalOrder.withGlobalSeq(docs, "id", "seq", 7).rdd.getNumPartitions == 7)
  }

  test("sampleByRates: per-group thresholds exact; temperature rates flatten the mixture") {
    import spark.implicits._
    val mixed = (1 to 3000).map(i =>
      (i.toLong, if (i <= 2400) "big" else "small")).toDF("id", "src")
    val kept = Sampling.sampleByRates(mixed, "src", "id",
      Map("big" -> 2500), defaultBp = 10000, seed = "m")
    // exact: kept set equals the manual bucket filter per group
    val expect = mixed.filter(
      (col("src") === "big" && Sampling.bucket(col("id"), "m") < 2500) ||
      (col("src") =!= "big" && Sampling.bucket(col("id"), "m") < 10000))
    assert(kept.select("id").as[Long].collect().sorted.toSeq ==
      expect.select("id").as[Long].collect().sorted.toSeq)
    // the small source is untouched; the big one is near its 25% rate
    val bySrc = kept.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") == 600L)
    assert(bySrc("big") > 450 && bySrc("big") < 750, bySrc.toString)

    // temperature flattening: rarest source anchors at 10000 bp, larger
    // sources scale as count^(T-1); T=1 keeps the natural distribution
    val flat = Sampling.temperatureRatesBp(mixed, "src", 0.5)
    assert(flat("small") == 10000)
    assert(flat("big") == math.round(math.pow(2400.0, -0.5) / math.pow(600.0, -0.5) * 10000).toInt)
    val natural = Sampling.temperatureRatesBp(mixed, "src", 1.0)
    assert(natural.values.forall(_ == 10000))
  }

  test("withGlobalSeq with duplicate keys: still a contiguous permutation, grouped by key") {
    import graft.operators.GlobalOrder
    import spark.implicits._
    val dups = (0L until 60L).map(i => (i % 5, i)).toDF("k", "payload")
    val got = GlobalOrder.withGlobalSeq(dups, "k", "seq", 6)
      .select("k", "seq").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.map(_._2).sorted.toSeq == (1L to 60L).toSeq, "seq must be a contiguous 1..N permutation")
    // all rows of one key occupy a contiguous seq interval (range partitioning
    // + in-partition sort keep equal keys adjacent)
    got.groupBy(_._1).foreach { case (k, rows) =>
      val seqs = rows.map(_._2).sorted
      assert(seqs.last - seqs.head + 1 == seqs.length, s"key $k seqs not contiguous: ${seqs.toSeq}")
    }
  }
}
