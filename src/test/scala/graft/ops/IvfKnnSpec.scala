package graft.ops

import graft.SharedSpark
import graft.similarity.Knn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfKnnSpec extends AnyFunSuite with SharedSpark {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** Deterministic "trained" centroids: the first n corpus vectors. */
  private def centroids(n: Int): Seq[Array[Float]] =
    emb.orderBy("vec_id").limit(n).collect()
      .map(_.getSeq[Float](1).toArray).toSeq

  test("full probe (nprobe = nlist) reproduces brute-force exactly") {
    val queries = emb.where(col("vec_id") < 5)
    val brute = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val cs = centroids(8)
    val ivf = Knn.ivfTopK(emb, queries, cs, "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("knnJoin at full probe ≡ per-vector brute force; no broadcast of the corpus side") {
    val cs = centroids(8)
    val graph = Knn.knnJoin(emb, cs, "vec_id", "embedding", k = 3, nprobe = 8)
    val got = graph.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Knn.bruteForceTopK(emb, emb, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == brute)
    // every vector has exactly k ranked neighbors
    val n = emb.count()
    assert(graph.groupBy("query_id").count().where(col("count") =!= 3).count() == 0)
    assert(graph.count() == 3 * n)
    // the join must be EQUI on the list id — never a cross join: blocking
    // is what caps the pair scan at nprobe/nlist · n². (AQE may still
    // broadcast one side at toy scale; at corpus scale both sides shuffle
    // on list_id, which a hash/sort-merge equi-join does and a nested-loop
    // join cannot.)
    val plan = graph.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"kNN join degenerated to an unblocked cross join:\n$plan")
    assert(plan.contains("list_id"), s"join not keyed on the IVF list id:\n$plan")
  }

  test("knnJoinIncremental: folding a batch reproduces the full-recompute graph exactly") {
    val cs = centroids(8)
    val corpus = emb.where(col("vec_id") < 80)
    val batch = emb.where(col("vec_id") >= 80 && col("vec_id") < 100)
    val graph = Knn.knnJoin(corpus, cs, "vec_id", "embedding", k = 3, nprobe = 8)
    val incr = Knn.knnJoinIncremental(graph, corpus, batch, cs,
      "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Knn.knnJoin(emb.where(col("vec_id") < 100), cs,
      "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(incr == full,
      s"incremental != recompute: only-incr=${(incr -- full).take(5)} only-full=${(full -- incr).take(5)}")
  }

  test("knnJoin partial probe: recall degrades gracefully, pair scan shrinks") {
    val cs = centroids(8)
    val exact = Knn.knnJoin(emb, cs, "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Knn.knnJoin(emb, cs, "vec_id", "embedding", k = 3, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // approximate results are a plausible subset-quality answer: same
    // cardinality shape (≤ k per query) and decent overlap with exact
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.5, s"full-vs-partial probe recall $recall")
  }

  test("persisted IvfIndex: full-probe search ≡ brute force; scan prunes to probed partitions") {
    import graft.similarity.IvfIndex
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val idx = IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding",
      nlist = 8, iters = 2)
    val queries = emb.where(col("vec_id") < 5)

    // full probe over the persisted index = brute force
    val brute = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaIndex = idx.search(queries, "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaIndex == brute)

    // a 1-probe search's scan is pruned at the MANIFEST level — only the
    // probed lists' file groups are opened, before any file is read
    val scan = idx.probedScan(queries, "embedding", nprobe = 1)
    val vectors = graft.tables.ManagedTable.load(spark, wh, "emb_vectors").get
    val fullFiles = vectors.readPhysical().inputFiles.toSet
    val scanFiles = scan.inputFiles.toSet
    assert(scanFiles.nonEmpty && scanFiles.size < fullFiles.size,
      s"probe opened ${scanFiles.size}/${fullFiles.size} groups — no manifest pruning")
    assert(scanFiles.subsetOf(fullFiles))
    // ...and the probe covers a strict subset of the corpus
    assert(scan.count() > 0 && scan.count() < emb.count())

    // reload from disk finds the same index
    assert(IvfIndex.load(spark, wh, "emb").isDefined)
    assert(IvfIndex.load(spark, wh, "missing").isEmpty)

    // REBUILD replaces assignments (no duplicate vectors under stale lists)
    val total = emb.count()
    val rebuilt = IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding",
      nlist = 4, iters = 1)
    assert(rebuilt.probedScan(queries, "embedding", nprobe = 4).count() == total,
      "rebuild must replace, not append")
    assert(rebuilt.nlist == 4)
  }

  test("persisted IvfIndex: addBatch vectors are immediately searchable") {
    import graft.similarity.IvfIndex
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf2").toString
    val idx = IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding",
      nlist = 4, iters = 1)
    // a new vector equal to vec 0's embedding, under a fresh id
    val v0 = emb.where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val batch = Seq((90001L, v0)).toDF("vec_id", "embedding")
    idx.addBatch(batch, "vec_id", "embedding")
    // searching WITH that vector: its identical twin (vec 0) must be the
    // rank-1 neighbor at cosine 1.0 (self is excluded by query_id)
    val res = idx.search(batch, "vec_id", "embedding", k = 3, nprobe = 4)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(res.nonEmpty && res.head._1 == 1 && res.head._2 == 0L && res.head._3 == 1.0,
      s"twin not found at rank 1: ${res.mkString(",")}")
    // and searching FROM an original vector finds the added twin
    val back = idx.search(emb.where(col("vec_id") === 0), "vec_id", "embedding",
      k = 3, nprobe = 4).collect().map(_.getLong(2))
    assert(back.contains(90001L), s"added vector not searchable: ${back.mkString(",")}")
  }

  test("persisted IvfIndex: removeVectors tombstones without rewrite; re-add wins") {
    import graft.similarity.IvfIndex
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfrm").toString
    val idx = IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding",
      nlist = 4, iters = 1)
    val q = emb.where(col("vec_id") === 0)
    val before = idx.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(_.getLong(2)).toSet
    assert(before.nonEmpty)
    val victim = before.head
    idx.removeVectors(col("neighbor_id") === victim)
    val after = idx.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(_.getLong(2)).toSet
    assert(!after.contains(victim), s"removed vector $victim still returned")
    // removal never rewrote the base: full probe still serves everything else
    assert(idx.probedScan(q, "embedding", nprobe = 4).count() == emb.count() - 1 + 0)
    // re-adding the id makes it searchable again (new seq beats tombstone)
    val vVec = emb.where(col("vec_id") === victim).select("embedding")
      .collect().head.getSeq[Float](0)
    idx.addBatch(Seq((victim, vVec)).toDF("vec_id", "embedding"), "vec_id", "embedding")
    val again = idx.search(q, "vec_id", "embedding", k = 5, nprobe = 4)
      .collect().map(_.getLong(2)).toSet
    assert(again.contains(victim), "re-added vector not searchable")
  }

  test("persisted IvfIndex: wrong-dimension vectors fail fast, not silently misindexed") {
    import graft.similarity.IvfIndex
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf3").toString
    val idx = IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding",
      nlist = 4, iters = 1)
    val before = idx.probedScan(emb.limit(1), "embedding", nprobe = 4).count()
    val bad = Seq((91L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception](idx.addBatch(bad, "vec_id", "embedding"))
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | "))
    assert(rootMsg(ex).contains("does not match index dimension"), rootMsg(ex))
    // the failed batch left no partial state behind (append never committed)
    assert(IvfIndex.load(spark, wh, "emb").get
      .probedScan(emb.limit(1), "embedding", nprobe = 4).count() == before)
  }

  test("persisted IvfIndex: crashed rebuild windows recover — old or new, never missing") {
    import graft.similarity.IvfIndex
    val wh = java.nio.file.Files.createTempDirectory("graft_ivf4").toString
    IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding", nlist = 4, iters = 1)
    val total = emb.count()
    val live = new java.io.File(s"$wh/emb_vectors")
    // window 1: crash between rename-aside and rename-in (live missing,
    // aside present) → load rolls the OLD index back
    assert(live.renameTo(new java.io.File(s"$wh/emb_vectors__old")))
    val rolled = IvfIndex.load(spark, wh, "emb")
    assert(rolled.isDefined, "load must roll back the aside vectors table")
    assert(rolled.get.probedScan(emb.limit(1), "embedding", nprobe = 4).count() == total)
    assert(live.exists() && !new java.io.File(s"$wh/emb_vectors__old").exists())
    // window 2: crash with a COMPLETE staged table and live set aside →
    // load finishes the swap to the staged (new) assignments
    assert(live.renameTo(new java.io.File(s"$wh/emb_vectors__new")))
    val finished = IvfIndex.load(spark, wh, "emb")
    assert(finished.isDefined, "load must finish the staged swap")
    assert(finished.get.probedScan(emb.limit(1), "embedding", nprobe = 4).count() == total)
    // window 3: an abandoned staged sibling next to a live index is
    // debris — but READERS must not sweep it (a load during a concurrent
    // rebuild would otherwise delete the writer's staging mid-append);
    // only the next build(), the single writer, cleans it up
    new java.io.File(s"$wh/emb_vectors__new").mkdirs()
    assert(IvfIndex.load(spark, wh, "emb").isDefined)
    assert(new java.io.File(s"$wh/emb_vectors__new").exists(),
      "reader load must not delete staging debris")
    IvfIndex.build(spark, wh, "emb", emb, "vec_id", "embedding", nlist = 4, iters = 1)
    assert(!new java.io.File(s"$wh/emb_vectors__new").exists(),
      "build must sweep stale staging debris")
    // window 4: a HALF-BUILT staged table (no re-pointed meta marker) with
    // no live index is never promoted — a crashed FIRST build yields "no
    // index", not a corrupt one
    val wh2 = java.nio.file.Files.createTempDirectory("graft_ivf5").toString
    graft.tables.ManagedTable.create(spark, wh2, "emb_vectors__new",
      emb.schema, Seq.empty) // staged, never re-pointed: incomplete
    assert(IvfIndex.load(spark, wh2, "emb").isEmpty,
      "half-built staging must not be promoted to a live index")
  }

  test("partial probe keeps decent recall at a fraction of the scan") {
    val queries = emb.where(col("vec_id") < 20)
    val brute = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Knn.ivfTopK(emb, queries, centroids(8), "vec_id", "embedding",
      k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low for nprobe=half")
    assert(ivf.size <= brute.size)
  }
}
