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

  test("SemanticDedup: within-cell near-dups drop (lower id wins), cross-cell survive") {
    import graft.dedup.SemanticDedup
    val spark2 = spark
    import spark2.implicits._
    // two tight direction groups (+x-ish and -x-ish); ids 1,2 colinear
    // dups; 3 also +x-but-orthogonal-ish; 10,11 colinear dups in -x
    val emb = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(2.0f, 0.2f)), (3L, Array(0.1f, 1.0f)),
      (10L, Array(-1.0f, -0.1f)), (11L, Array(-3.0f, -0.3f))
    ).toDF("id", "vec")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.0f))).toDF("cid", "cv")
    val kept = SemanticDedup.keep(emb, "id", "vec", cents, "cid", "cv", tau = 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 dropped (dup of 1 in cell 0); 11 dropped (dup of 10 in cell 1);
    // 3 kept (same cell as 1 but far below tau)
    assert(kept === Map(1L -> 0L, 3L -> 0L, 10L -> 1L))
    // a lax tau inside a cell never reaches across cells: with tau low
    // enough to pair anything, 1 and 10 both survive (different cells)
    val lax = SemanticDedup.keep(emb, "id", "vec", cents, "cid", "cv", tau = -1.0)
      .collect().map(_.getLong(0)).toSet
    assert(lax.contains(1L) && lax.contains(10L))
  }
}
