package graft.ops

import graft.SharedSpark
import graft.dedup.EmbeddingNearDup
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingNearDupSpec extends AnyFunSuite with SharedSpark {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)),   // near-dup of 1
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.2f)),    // opposite direction
      (4L, Array(0.0f, 1.0f, 0.0f, 0.3f))      // orthogonal-ish to 1
    ).toDF("id", "vec")
  }

  test("brute force (planes=0) finds the near-dup pair above threshold") {
    val out = EmbeddingNearDup.pairs(df, "id", "vec", threshold = 0.95, planes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("LSH bucketing never emits cross-bucket pairs and keeps same-bucket dups") {
    // planes=1 buckets on sign of dim 1: {1,2,4+?}: dim1 of id4 is 0 → bucket "0" with id3
    val out = EmbeddingNearDup.pairs(df, "id", "vec", threshold = -1.0, planes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))
    // 3 (negative dim1) can never pair with 1/2 (positive dim1)
    assert(!out.exists { case (a, b) => Set(a, b) == Set(1L, 3L) || Set(a, b) == Set(2L, 3L) })
  }

  test("threshold filters") {
    val out = EmbeddingNearDup.pairs(df, "id", "vec", threshold = 0.99999, planes = 0)
      .collect()
    assert(out.isEmpty)
  }
}
