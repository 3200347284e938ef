package graft.ops

import graft.SharedSpark
import graft.operators.SketchRollup
import graft.tables.ManagedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[SketchRollup]]: determinism, union ≡ whole, incremental merge ≡
  * rebuild, and the error envelope the oracle row pins at 5 %.
  */
class SketchRollupSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def data(n: Int) = {
    val rnd = new scala.util.Random(3)
    (1 to n).map(i => (i % 7, rnd.nextInt(2000).toLong)).toDF("bucket", "uid")
  }

  test("merge order moves estimates only inside the error envelope; union ≈ whole") {
    // HLL_4 unions are NOT bit-stable under merge order (representation
    // transitions differ), so estimates wiggle with partitioning — but
    // only within the sketch's error envelope. The oracle row therefore
    // hashes the 5% BOUND, never the raw estimate.
    val df = data(20000)
    def estimates(parts: Int) =
      SketchRollup.build(df.repartition(parts), Seq("bucket"), "uid")
        .select(col("bucket"), hll_sketch_estimate(col("sketch")).as("e"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (e1, e17) = (estimates(1), estimates(17))
    e1.foreach { case (b, v) =>
      assert(math.abs(e17(b) - v) <= math.max(4L, (v * 0.02).toLong),
        s"bucket $b drifted: $v vs ${e17(b)}")
    }
    val unionAll = SketchRollup.estimateWhere(
      SketchRollup.build(df, Seq("bucket"), "uid"), lit(true))
    val whole = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("uid"), lit(12)))).head().getLong(0)
    assert(math.abs(unionAll - whole) <= math.max(4L, (whole * 0.02).toLong),
      s"bucket-union $unionAll vs one-shot $whole")
  }

  test("incremental mergeInto ≈ rebuild over the full data; counts add") {
    val full = data(24000)
    val (a, b) = (full.where(col("uid") % 2 === 0), full.where(col("uid") % 2 === 1))
    val wh = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    val seed = SketchRollup.build(a, Seq("bucket"), "uid")
    val t = ManagedTable.create(spark, wh, "rollup", seed.schema, Seq("bucket"))
    t.append(seed)
    SketchRollup.mergeInto(t, SketchRollup.build(b, Seq("bucket"), "uid"))
    val merged = t.read()
      .select(col("bucket"), hll_sketch_estimate(col("sketch")).as("e"), col("n_rows"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rebuilt = SketchRollup.build(full, Seq("bucket"), "uid")
      .select(col("bucket"), hll_sketch_estimate(col("sketch")).as("e"), col("n_rows"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    merged.foreach { case (b, (e, n)) =>
      val (re, rn) = rebuilt(b)
      assert(n == rn, s"bucket $b row count: $n vs $rn")
      assert(math.abs(e - re) <= math.max(4L, (re * 0.02).toLong),
        s"bucket $b estimate drifted: $e vs $re")
    }
  }

  test("estimates stay inside the 5% envelope the oracle row claims") {
    val sk = SketchRollup.build(data(30000), Seq("bucket"), "uid")
    val bad = sk.select(col("exact_nd"), hll_sketch_estimate(col("sketch")).as("e"))
      .where(abs(col("e") - col("exact_nd")) > col("exact_nd") * 0.05)
    assert(bad.isEmpty, bad.collect().mkString(","))
  }
}
