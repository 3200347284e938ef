package graft.ops

import graft.SharedSpark
import graft.dedup._
import graft.similarity.Knn
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmOpsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "the quick brown fox leaps over the lazy dog"),   // near dup
    (3L, "completely different text about spark engines and scale"),
    (4L, "")                                               // degenerate
  ).toDF("doc_id", "text")

  test("MinHashIndex: incremental probe equals the one-shot pair set restricted to the batch") {
    val wh = java.nio.file.Files.createTempDirectory("mh_idx_spec").toString
    val corpusDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox leaps over the lazy dog today"),
      (4L, "completely different text about spark engines and scale"),
      (6L, "yet another unrelated document describing manifest commits")
    ).toDF("doc_id", "text")
    val batchDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),  // dup of 0/2
      (3L, "completely different text about spark engines and scale"), // dup of 4
      (5L, "a brand new document with no duplicates whatsoever"),
      (7L, "a brand new document with zero duplicates whatsoever")  // near-dup of 5
    ).toDF("doc_id", "text")
    val idx = MinHashIndex.create(spark, wh, "mh", k = 16, bands = 16, shingleSize = 3)
    assert(idx.addBatch(corpusDocs) == 4)
    // re-adding the same docs is a no-op
    assert(idx.addBatch(corpusDocs) == 0)
    assert(idx.signatures.count() == 4)

    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val incremental = pairSet(idx.candidatePairs(batchDocs))
    // oracle: one-shot pairs over the union, restricted to pairs touching a batch doc
    val batchIds = Set(1L, 3L, 5L, 7L)
    val oneShot = pairSet(MinHashLSH.candidatePairs(
      corpusDocs.unionByName(batchDocs), "text", "doc_id", k = 16, bands = 16))
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(incremental == oneShot, s"incremental=$incremental oneShot=$oneShot")
    assert(incremental.nonEmpty)

    // second wave: after adding the first batch, a later batch probes
    // the grown index and still equals the one-shot restriction
    idx.addBatch(batchDocs)
    val wave2 = Seq((9L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val inc2 = pairSet(idx.candidatePairs(wave2))
    val one2 = pairSet(MinHashLSH.candidatePairs(
      corpusDocs.unionByName(batchDocs).unionByName(wave2), "text", "doc_id",
      k = 16, bands = 16)).filter(p => p._1 == 9L || p._2 == 9L)
    assert(inc2 == one2)
    // load() round-trips the parameters
    val reloaded = MinHashIndex.load(spark, wh, "mh").get
    assert(reloaded.k == 16 && reloaded.bands == 16 && reloaded.shingleSize == 3)
  }

  test("tokens/counts/ratios handle empty strings") {
    val r = docs.select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.punctRatio(col("text")).as("p"),
      TextFunctions.bpeishTokenCount(col("text")).as("b"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n") == 9)
    assert(r(4).getAs[Int]("n") == 0 && r(4).getAs[Double]("p") == 0.0)
    assert(r(3).getAs[Int]("b") == 8)
  }

  test("quality score rewards stopword-bearing prose") {
    val r = docs.select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
      .orderBy("doc_id").collect()
    assert(r(4).getAs[Double]("q") <= 0.5) // empty text fails length+stopword
    assert(r(0).getAs[Double]("q") >= 0.5)
  }

  test("langId picks dominant stopword language, 'und' when none") {
    val df = Seq(
      ("the cat and the dog went to the market"),
      ("el perro y la casa es que no se un"),
      ("xyzzy qwerty")
    ).toDF("text")
    val out = df.select(TextFunctions.langId(col("text")).as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprints: md5 stable, shingle fingerprint survives local edit") {
    val r = docs
      .select(col("doc_id"), col("text"), TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.minShingleFingerprintFromTokens(col("tk"), 3).as("sfp"))
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) == r(1).getString(1)) // exact dups same md5
    assert(r(0).getString(1) != r(2).getString(1))
    assert(r(4).isNullAt(2)) // no shingles in empty text
  }

  test("wordShingles: distinct n-grams, short text → empty") {
    val r = Seq("a b c d", "a b").toDF("t")
      .select(Shingles.wordShingles(col("t"), 3).as("s")).collect()
    assert(r(0).getSeq[String](0).toSet == Set("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
  }

  test("exact dedup groups and drop") {
    val g = ExactDedup.groups(docs, "text", "doc_id")
    val dupGroup = g.where(col("group_size") === 2).collect()
    assert(dupGroup.length == 1 && dupGroup.head.getAs[Long]("canonical_id") == 0L)
    assert(ExactDedup.dropExactDuplicates(docs, "text", "doc_id").count() == 4)
  }

  test("minhash LSH finds near-dup candidates without all-pairs") {
    // rows-per-band=1 (16 bands) for high recall at moderate Jaccard —
    // doc 2 differs from doc 0 in one middle word (J = 4/10)
    val pairs = MinHashLSH.candidatePairs(docs, "text", "doc_id", k = 16, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical docs always collide
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc
  }

  test("minhash LSH hot-bucket cap: generous cap is pair-equivalent, tight cap kills the mega-cluster") {
    import spark.implicits._
    // a 6-doc identical mega-cluster + one near-dup pair
    val mega = (10L to 15L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val near = Seq(
      (20L, "completely different content about spark shuffles and partitions"),
      (21L, "completely different content about spark shuffles and executors"))
    val d = (mega ++ near).toDF("doc_id", "text")
    val uncapped = MinHashLSH.candidatePairs(d, "text", "doc_id", k = 16, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap >= every bucket size: identical output (equivalence under the cap)
    val generous = MinHashLSH.candidatePairs(d, "text", "doc_id", k = 16, bands = 16,
      maxBucketSize = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(generous == uncapped)
    // cap below the mega-cluster's bucket size: its 15 intra-pairs are
    // suppressed, the small near-dup bucket survives
    val tight = MinHashLSH.candidatePairs(d, "text", "doc_id", k = 16, bands = 16,
      maxBucketSize = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.contains((20L, 21L)), "small buckets must survive the cap")
    assert(!tight.exists(p => p._1 >= 10L && p._1 <= 15L && p._2 <= 15L),
      s"mega-cluster pairs must be suppressed by the cap, got $tight")
  }

  test("ngram jaccard exact pairs with threshold") {
    val pairs = NgramJaccard.pairs(docs, "text", "doc_id", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1L).get
    assert(exact._3 == 1.0)
    // 3 of 7 shingles touched by the one-word edit: J = 4/10 exactly
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 0.4))
    // threshold excludes the unrelated doc
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash: identical → distance 0, near-dup close, distinct far") {
    val fp = SimHash.simhashed(docs.where(length(col("text")) > 0), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(2L)) < ham(fp(0L), fp(3L)))
    // column-level hamming agrees with scala-side
    val d = Seq((fp(0L), fp(2L))).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b"))).as[Long].collect().head
    assert(d == ham(fp(0L), fp(2L)))
  }

  test("knn: brute-force exact and sign-LSH agree on same-bucket neighbors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.2f, 0.1f)),
      (1L, Array(0.9f, 0.2f, 0.1f, 0.2f)),   // close to 0
      (2L, Array(-1.0f, -0.1f, 0.3f, -0.2f)),
      (3L, Array(0.8f, 0.15f, 0.25f, 0.05f)) // close to 0 too
    ).toDF("vec_id", "embedding")
    val bf = Knn.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0L), "vec_id", "embedding", 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(bf.map(_._2).toSet == Set(1L, 3L))
    val lsh = Knn.signLshTopK(vecs, vecs.where(col("vec_id") === 0L), "vec_id", "embedding", 2, planes = 2)
      .collect().map(r => r.getLong(2)).toSet
    assert(lsh == Set(1L, 3L)) // 2 lives in the opposite sign bucket
  }

  test("bm25: hand-computed score on a tiny corpus; rarity and length behave") {
    val corpus = Seq(
      (1L, "spark spark spark"),        // tf=3, dl=3
      (2L, "spark engine"),             // tf=1, dl=2
      (3L, "engine room"),              // no match
      (4L, "a b c d e f g h")           // no match, long
    ).toDF("doc_id", "text")
    val r = TextFunctions.bm25Rank(corpus, "doc_id", "text", Seq("spark"), topK = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getLong(2)))
    // only matching docs appear, ranked
    assert(r.map(_._1).toSet == Set(1L, 2L))
    assert(r.find(_._1 == 1L).get._3 == 1L, "higher-tf doc ranks first")
    // hand computation: N=4, df=2, idf=ln((4-2+0.5)/(2+0.5)+1)=ln(2)
    // avgdl=(3+2+2+8)/4=3.75
    // doc1: 3*2.2/(3+1.2*(0.25+0.75*3/3.75))*ln2 -> round 6dp
    val idf = math.log(2.0)
    def s(tf: Int, dl: Int) = BigDecimal(
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 3.75)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.find(_._1 == 1L).get._2 == s(3, 3))
    assert(r.find(_._1 == 2L).get._2 == s(1, 2))
  }

  test("bm25: null/empty text scores nothing and does not poison avgdl") {
    val corpus = Seq(
      (1L, Some("spark x")), (2L, None), (3L, Some(""))
    ).toDF("doc_id", "text")
    val r = TextFunctions.bm25Rank(corpus, "doc_id", "text", Seq("spark"), topK = 5)
    val rows = r.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    // N=3, df=1, avgdl=(2+0+0)/3: null text must count as 0, not -1
    val expected = BigDecimal(
      math.log((3 - 1 + 0.5) / 1.5 + 1.0) * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / (2.0 / 3))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.head.getDouble(1) == expected)
  }

  test("multimodal: binary meta + stubbed feature extraction plumbing") {
    val assets = Seq(
      (1L, "image/png", "fakepngbytes".getBytes),
      (2L, "audio/wav", "fakewav".getBytes)
    ).toDF("asset_id", "media_type", "content")
    val meta = graft.multimodal.Multimodal.binaryMeta(assets, "content")
      .orderBy("asset_id").collect()
    assert(meta(0).getAs[Int]("byte_length") == 12)
    assert(meta(0).getAs[String]("sha256").length == 64)
    val feats = graft.multimodal.Multimodal.extractFeatures(spark, assets, "content", "asset_id")
      .orderBy("asset_id").collect()
    assert(feats.length == 2 && feats(0).getSeq[Float](1).length == 8)
    assert(feats(0).getSeq[Float](1).sum > 0f)
  }

  test("multimodal: resize and frame-sample stages keep ids, shrink/fan out content") {
    val assets = Seq(
      (1L, Array.fill[Byte](64)(7)), (2L, Array.fill[Byte](8)(3))
    ).toDF("asset_id", "content")
    val resized = graft.multimodal.Multimodal.transformContent(
      spark, assets, "content", "asset_id",
      graft.multimodal.Multimodal.stubResize(32, 32)).orderBy("asset_id").collect()
    assert(resized(0).getAs[Array[Byte]]("content").length == 16)  // 64/4
    assert(resized(0).getAs[Int]("width") == 32)

    val frames = graft.multimodal.Multimodal.sampleFrames(
      spark, assets, "content", "asset_id",
      graft.multimodal.Multimodal.stubFrameSampler(frameSize = 8, everyN = 2))
    val byAsset = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // asset 1: 64/8 = 8 chunks, every 2nd → 4 frames; asset 2: 1 chunk → 1
    assert(byAsset == Map(1L -> 4L, 2L -> 1L))
  }

  // The driver-hashed surfaces of text_lm_score / text_classifier_score
  // are transcendental-free (exact integer sums); the ln/exp-derived
  // columns are checked HERE, with tolerance, against closed-form values.
  test("trigramLmScore: exact integer sums hand-checked; avg_logp matches closed form within 1e-5") {
    val model = Seq((1L, "a b c a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val scored = Seq((0L, "a b c d"), (2L, "x y z")).toDF("doc_id", "text")
    val r = TextFunctions.trigramLmScore(model, scored, "doc_id", "text")
      .orderBy("doc_id").collect()
    // model: trigrams {a b c:2, b c a:1, c a b:1, a b d:1}; bigrams
    // {a b:3, b c:2, c a:1, b d:1}; V=4.
    // doc 0 grams: "a b c" (c3=2, c2[a b]=3) → num=5, den=10;
    //              "b c d" (c3=0, c2[b c]=2) → num=1, den=8
    val d0 = r(0)
    assert(d0.getAs[Long]("n_trigrams") == 2L)
    assert(d0.getAs[Long]("sum_num") == 6L)
    assert(d0.getAs[Long]("sum_den") == 18L)
    val expected0 = (math.log(5.0 / 10.0) + math.log(1.0 / 8.0)) / 2.0
    assert(math.abs(d0.getAs[java.math.BigDecimal]("avg_logp").doubleValue() - expected0) < 1e-5)
    // doc 2 grams: "x y z" unseen everywhere → num=1, den=0+V=4
    val d2 = r(1)
    assert(d2.getAs[Long]("n_trigrams") == 1L)
    assert(d2.getAs[Long]("sum_num") == 1L && d2.getAs[Long]("sum_den") == 4L)
    assert(math.abs(d2.getAs[java.math.BigDecimal]("avg_logp").doubleValue() - math.log(0.25)) < 1e-5)
  }

  test("hashedClassifierScore: w_sum integer-exact and score equals sigmoid(bias + w_sum/n_feats) within 1e-5") {
    val w = Array.tabulate(64)(j => ((j * 7) % 41 - 20).toDouble)
    val r = TextFunctions.hashedClassifierScore(docs, "doc_id", "text", w, bias = 0.125)
      .orderBy("doc_id").collect()
    r.foreach { row =>
      val n = row.getAs[Long]("n_feats")
      if (n == 0) assert(row.isNullAt(row.fieldIndex("score")))
      else {
        val ws = row.getAs[Double]("w_sum")
        assert(ws == math.rint(ws), s"integer weights must sum exactly, got $ws")
        val exp = 1.0 / (1.0 + math.exp(-(0.125 + ws / n)))
        assert(math.abs(row.getAs[java.math.BigDecimal]("score").doubleValue() - exp) < 1e-5)
      }
    }
    // 9 unigrams + 8 bigrams for doc 0
    assert(r(0).getAs[Long]("n_feats") == 17L)
  }
}
