package graft.ops

import graft.SharedSpark
import graft.operators.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class TopKPerKeySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("two-phase ≡ naive single window on a skewed random relation") {
    val rnd = new Random(7)
    // one hot key with most of the rows, many cold keys
    val rows = List.fill(3000)(("hot", rnd.nextInt(100), rnd.nextInt(1000000))) ++
      List.fill(1000)((s"k${rnd.nextInt(200)}", rnd.nextInt(100), rnd.nextInt(1000000)))
    // unique ids for a total rank key
    val df = rows.zipWithIndex.map { case ((k, s, _), i) => (k, s, i.toLong) }
      .toDF("key", "score", "id").repartition(16)
    val rk = struct((-col("score")).as("negs"), col("id").as("id"))
    val got = TopKPerKey.topK(df, Seq("key"), rk, 7)
      .select("key", "score", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(identity).toSeq
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("key", "score", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(identity).toSeq
    assert(got == want)
  }

  test("keeps fewer than k when a key has fewer rows; k=1 works") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("key", "id")
    assert(TopKPerKey.topK(df, Seq("key"), col("id"), 5).count() == 3)
    val one = TopKPerKey.topK(df, Seq("key"), col("id"), 1)
      .select("key", "id").as[(String, Long)].collect().sorted.toSeq
    assert(one == Seq(("a", 1L), ("b", 3L)))
  }

  test("plan: the heavy phase partitions by (key, pid), not by key alone") {
    val df = spark.range(1000).select((col("id") % 3).as("key"), col("id"))
      .repartition(8)
    val plan = TopKPerKey.topK(df, Seq("key"), col("id"), 2)
      .queryExecution.executedPlan.toString
    // first (inner) window exchange must include the pid column
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.exists(_.contains("__pid")),
      s"expected a (key, __pid) exchange in:\n$plan")
  }
}
