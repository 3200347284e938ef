package graft.ops

import graft.SharedSpark
import graft.similarity.IvfIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVFPQ with exact re-rank ([[IvfIndex.buildPq]]/`searchPq`): the
  * compression layer must reproduce [[IvfIndex.search]] exactly at
  * full probe + full refine (the re-rank makes codebook error vanish when
  * the shortlist covers every candidate), hold high recall at trained
  * fidelity, encode incremental batches, and die with the quantizer on a
  * rebuild.
  */
class IvfPqSpec extends AnyFunSuite with SharedSpark {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("full probe + full refine ≡ plain IVF search; ADC stage never scans floats") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val idx = IvfIndex.build(spark, wh, "pq1", emb, "vec_id", "embedding",
      nlist = 4, iters = 3)
    idx.buildPq(m = 4, kPerSub = 8, iters = 4)
    val queries = emb.where(col("vec_id") < 5)
    val n = emb.count().toInt
    val plain = canon(idx.search(queries, "vec_id", "embedding", k = 3, nprobe = 4))
    val pq = canon(idx.searchPq(queries, "vec_id", "embedding",
      k = 3, nprobe = 4, refine = n))
    assert(pq == plain)
  }

  test("trained codebooks at modest refine recall >= 0.8 of exact top-k") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val idx = IvfIndex.build(spark, wh, "pq2", emb, "vec_id", "embedding",
      nlist = 2, iters = 4)
    idx.buildPq(m = 16, kPerSub = 16, iters = 6)
    val queries = emb.where(col("vec_id") < 20)
    val exact = canon(idx.search(queries, "vec_id", "embedding", k = 5, nprobe = 2))
      .map(t => (t._1, t._3))
    val pq = canon(idx.searchPq(queries, "vec_id", "embedding",
      k = 5, nprobe = 2, refine = 10)).map(t => (t._1, t._3))
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVFPQ recall $recall below 0.8")
  }

  test("addBatch on a PQ-layered index encodes with the stored codebooks") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
    val idx = IvfIndex.build(spark, wh, "pq3", half, "vec_id", "embedding",
      nlist = 2, iters = 3)
    idx.buildPq(m = 4, kPerSub = 8, iters = 3)
    idx.addBatch(rest, "vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 3)
    val n = emb.count().toInt
    val pq = canon(idx.searchPq(queries, "vec_id", "embedding",
      k = 3, nprobe = 2, refine = n))
    val plain = canon(idx.search(queries, "vec_id", "embedding", k = 3, nprobe = 2))
    assert(pq == plain, "appended vectors must be scorable (no null codes)")
    assert(pq.map(_._3).exists(id => id % 2 == 1), "batch-added vectors appear as neighbors")
  }

  test("a rebuild drops the stale PQ layer") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    val idx = IvfIndex.build(spark, wh, "pq4", emb, "vec_id", "embedding",
      nlist = 2, iters = 2)
    idx.buildPq(m = 4, kPerSub = 4, iters = 2)
    assert(idx.pqCodebooks.nonEmpty)
    val rebuilt = IvfIndex.build(spark, wh, "pq4", emb, "vec_id", "embedding",
      nlist = 4, iters = 2)
    assert(rebuilt.pqCodebooks.isEmpty, "stale codebooks must not survive a rebuild")
    intercept[IllegalArgumentException] {
      rebuilt.searchPq(emb.limit(1), "vec_id", "embedding", k = 1)
    }
  }
}
