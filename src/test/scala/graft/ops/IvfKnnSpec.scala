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
