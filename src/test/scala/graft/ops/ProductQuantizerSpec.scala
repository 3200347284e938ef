package graft.ops

import graft.SharedSpark
import graft.similarity.{Knn, ProductQuantizer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProductQuantizerSpec extends AnyFunSuite with SharedSpark {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("one-hot codebooks: encoding reduces to per-subspace argmax") {
    import spark.implicits._
    val w = 4
    val codebooks = (0 until 2).map(_ =>
      (0 until 4).map(c => Array.tabulate(w)(i => if (i == c) 1f else 0f)).toSeq)
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f, 0.2f, 0.3f, -1f, -2f, 5f, 0f)),
      (2L, Array(0f, 0f, 0f, 7f, 1f, 1f, 1f, 1.5f))).toDF("id", "v")
    val got = ProductQuantizer.encode(vecs, "v", codebooks)
      .select("id", "pq_code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got(1L) == List(0, 2)) // argmax of (0.9,...) and (-1,-2,5,0)
    assert(got(2L) == List(3, 3)) // 7f at pos 3; tie 1,1,1 then 1.5 wins
  }

  test("wrong-length vectors fail fast instead of encoding garbage") {
    import spark.implicits._
    val codebooks = Seq(Seq(Array(1f, 0f), Array(0f, 1f)))
    val bad = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v")
    val e = intercept[Exception] {
      ProductQuantizer.encode(bad, "v", codebooks).collect()
    }
    assert(e.getMessage.contains("pq encode"))
  }

  test("ADC over exactly-representable vectors reproduces exact L2 ranking") {
    import spark.implicits._
    // corpus vectors ARE product-codebook points -> quantization is
    // lossless and ADC distance == true squared L2
    val codebooks = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 4, k = 8, iters = 2, dim = 64)
    val w = 16
    def reconstruct(code: Seq[Int]): Array[Float] =
      code.zipWithIndex.flatMap { case (c, j) => codebooks(j)(c) }.toArray
    val sample = ProductQuantizer.encode(emb.limit(20), "embedding", codebooks)
      .select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), reconstruct(r.getSeq[Int](1))))
    val snapped = sample.toSeq.toDF("vec_id", "embedding")
    val enc = ProductQuantizer.encode(snapped, "embedding", codebooks)
    val queries = emb.where(col("vec_id") < 3)
    val adc = ProductQuantizer.adcTopK(enc, queries, codebooks,
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // exact L2 top-k over the same snapped corpus
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = snapped.toDF("neighbor_id", "cv")
    val exact = q.crossJoin(c).where(col("query_id") =!= col("neighbor_id"))
      .withColumn("d", round(aggregate(
        zip_with(col("qv"), col("cv"), (x, y) =>
          (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, v) => a + v), 6))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d").asc, col("neighbor_id").asc)))
      .where(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(adc == exact)
  }

  test("trained PQ: ADC shortlist captures the exact top-k (shortlist + re-rank workflow)") {
    // PQ's production shape: ADC builds a cheap shortlist from codes, an
    // exact pass re-ranks it. On near-uniform synthetic vectors (the
    // hardest case for quantization) the top-10 truth must land in the
    // ADC top-50 shortlist far above the random-shortlist rate (~10%).
    val codebooks = ProductQuantizer.train(emb, "vec_id", "embedding",
      m = 8, k = 16, iters = 2, dim = 64)
    val enc = ProductQuantizer.encode(emb, "embedding", codebooks)
    val queries = emb.where(col("vec_id") < 10)
    val adc = ProductQuantizer.adcTopK(enc, queries, codebooks,
      "vec_id", "embedding", k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // ground truth: exact squared-L2 top-k (ADC's own metric, unquantized)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val truth = q.crossJoin(c).where(col("query_id") =!= col("neighbor_id"))
      .withColumn("d", aggregate(
        zip_with(col("qv"), col("cv"), (x, y) =>
          (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, v) => a + v))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d").asc, col("neighbor_id").asc)))
      .where(col("rank") <= 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (adc & truth).size.toDouble / truth.size
    assert(recall > 0.5, s"PQ ADC recall@10 = $recall")
  }
}
