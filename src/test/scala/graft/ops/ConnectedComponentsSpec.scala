package graft.ops

import graft.SharedSpark
import graft.dedup.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class ConnectedComponentsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Reference union-find over the collected edge list. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches union-find on random graphs") {
    val rnd = new Random(7)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) == unionFind(edges))
    }
  }

  test("long chain needs multiple propagation rounds and still converges") {
    // a path graph 0-1-2-...-19: diameter 19 forces many rounds
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet == Set(0L), got.toString)
    assert(got.keySet == (0L to 19L).toSet)
  }

  test("under-converged run throws instead of returning a wrong clustering") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      ConnectedComponents.components(chain.toDF("a", "b"), "a", "b", maxIter = 2)
    }
  }

  private def runStar(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] =
    ConnectedComponents.componentsByStarContraction(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction matches union-find and plain propagation on random graphs") {
    val rnd = new Random(11)
    for (_ <- 1 to 3) {
      val n = 50
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(runStar(edges) == unionFind(edges))
    }
  }

  test("star contraction early exit is sound across graph shapes (round 12)") {
    // the round-12 loop exits half a round early when the large-star
    // relation repeats; this differential (vs union-find) sweeps shapes
    // that stress the exit — chains (many rounds), dense blobs (one
    // round), disjoint mixtures, and the documented large==e
    // counterexample family (stars hanging off non-min centers)
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      val n = 10 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(2 * n)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty)
        assert(runStar(edges) == unionFind(edges), s"trial $trial: $edges")
    }
    // the counterexample shape from the round-12 analysis: large(e) == e
    // but small-star still rewrites — a wrong early exit would emit node
    // 3 with two labels
    val trap = Seq((5L, 3L), (5L, 2L), (4L, 3L), (4L, 1L))
    assert(runStar(trap) == unionFind(trap))
  }

  test("star contraction closes a chain whose diameter defeats bounded propagation") {
    // a 60-node path: propagation at maxIter=5 must refuse; star
    // contraction closes it in O(log n) rounds
    val chain = (0L until 59L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      ConnectedComponents.components(chain.toDF("a", "b"), "a", "b", maxIter = 5)
    }
    val got = runStar(chain, maxIter = 15)
    assert(got.values.toSet == Set(0L), got.filter(_._2 != 0L).toString)
    assert(got.keySet == (0L to 59L).toSet)
  }
}
