package graft.ops

import graft.SharedSpark
import graft.operators.Salting
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltingSpec extends AnyFunSuite with SharedSpark {

  test("salted count/sum equal the direct aggregation on a skewed key") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v")

    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val sc = Salting.saltedCount(df, Seq("k"), Seq("v"), buckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ss = Salting.saltedSum(df, Seq("k"), "v", Seq("v"), buckets = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(sc == direct.map { case (k, (n, _)) => k -> n })
    assert(ss.keySet == direct.keySet)
    ss.foreach { case (k, s) => assert(math.abs(s - direct(k)._2) < 1e-6, k) }
  }

  test("salted join equals the plain join") {
    import spark.implicits._
    val left = ((1 to 5000).map(_ => ("hot", 1)) ++ Seq(("cold", 2))).toDF("k", "lv")
    val right = Seq(("hot", 10), ("cold", 20), ("unmatched", 30)).toDF("k", "rv")
    val plain = left.join(right, "k").groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Salting.saltedJoin(left, right, "k", buckets = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("lv") + col("rv")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
