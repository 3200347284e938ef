package graft.ops

import graft.SharedSpark
import graft.similarity.{KMeans, Knn, Quantize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 quantization round-trip bounds and the k-means → IVF contract. */
class VectorQuantizeSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("sq8: codes in [0,255], endpoints exact, error within half a level") {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("mn", array_min(col("e")))
      .withColumn("mx", array_max(col("e")))
      .withColumn("codes", Quantize.sq8Encode(col("e"), col("mn"), col("mx")))
      .withColumn("deq", Quantize.sq8Decode(col("codes"), col("mn"), col("mx")))
    val checked = e.select(
      array_min(col("codes")).as("cmin"),
      array_max(col("codes")).as("cmax"),
      Quantize.maxAbsError(col("e"), col("deq")).as("err"),
      ((col("mx") - col("mn")) / 510 * 1.0000001 + 1e-12).as("bound"))
    assert(checked.where(col("cmin") < 0 || col("cmax") > 255).isEmpty)
    // per-vector max reconstruction error ≤ half a quantization level
    assert(checked.where(col("err") > col("bound")).isEmpty)
    // min and max of each vector are representable exactly (codes 0 / 255)
    val exact = e.select(
      Quantize.maxAbsError(array(col("mn"), col("mx")),
        Quantize.sq8Decode(Quantize.sq8Encode(array(col("mn"), col("mx")),
          col("mn"), col("mx")), col("mn"), col("mx"))).as("endpoint_err"))
    assert(exact.agg(max("endpoint_err")).head().getDouble(0) < 1e-9)
  }

  test("sq8: constant vector codes to all-zero and decodes to itself") {
    val df = Seq((1L, Array(0.5, 0.5, 0.5))).toDF("id", "e")
      .withColumn("mn", array_min(col("e"))).withColumn("mx", array_max(col("e")))
      .withColumn("codes", Quantize.sq8Encode(col("e"), col("mn"), col("mx")))
      .withColumn("deq", Quantize.sq8Decode(col("codes"), col("mn"), col("mx")))
    val r = df.select(col("codes"), col("deq")).head()
    assert(r.getSeq[Int](0) == Seq(0, 0, 0))
    assert(r.getSeq[Double](1) == Seq(0.5, 0.5, 0.5))
  }

  test("kmeans recovers well-separated blob centers") {
    val blobs = Seq(
      (Array(10f, 10f), 0), (Array(10.5f, 9.5f), 0), (Array(9.5f, 10.5f), 0),
      (Array(-10f, -10f), 1), (Array(-10.5f, -9.5f), 1), (Array(-9.5f, -10.5f), 1),
      (Array(10f, -10f), 2), (Array(10.5f, -9.5f), 2), (Array(9.5f, -10.5f), 2)
    ).zipWithIndex.map { case ((v, b), i) => (i.toLong, v, b) }
      .toDF("vec_id", "embedding", "blob")
    val cs = KMeans.train(blobs, "vec_id", "embedding", k = 3, iters = 4)
    assert(cs.size == 3)
    // every blob mean has a trained centroid within distance 1 (blob radius ~0.7)
    val blobMeans = Seq(Array(10f, 10f), Array(-10f, -10f), Array(10f, -10f))
    blobMeans.foreach { bm =>
      val nearest = cs.map(c =>
        math.sqrt(c.zip(bm).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(nearest < 1.0, s"no centroid near blob ${bm.toSeq}: $nearest")
    }
  }

  test("trained-centroid full-probe IVF reproduces brute force") {
    val queries = emb.where(col("vec_id") < 5)
    val cs = KMeans.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val brute = Knn.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = Knn.ivfTopK(emb, queries, cs, "vec_id", "embedding", k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }
}
