package graft.streaming

import graft.SharedSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulDedupSpec extends AnyFunSuite with SharedSpark {

  test("replays in later batches are dropped; genuinely newer versions pass") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Int)]
    val out = StatefulDedup.dropStaleVersions(
      mem.toDF().toDF("key", "ts", "__op", "payload"), "key", "ts", "__op")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // batch 1: two versions of key 1 → only the winner (ts=5) emits
      mem.addData((1L, 3L, "c", 30), (1L, 5L, "u", 50), (2L, 1L, "c", 10))
      q.processAllAvailable()
      val b1 = spark.table("sdedup").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b1 == Set((1L, 5L), (2L, 1L)))

      // batch 2: replay of (1, ts=5) and older (1, ts=4) → dropped;
      // (2, ts=2) is newer → emitted
      mem.addData((1L, 5L, "u", 50), (1L, 4L, "u", 40), (2L, 2L, "u", 20))
      q.processAllAvailable()
      val b2 = spark.table("sdedup").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b2 == Set((1L, 5L), (2L, 1L), (2L, 2L)))

      // batch 3: same ts, higher op priority (d > u) wins across batches
      mem.addData((1L, 5L, "d", 0))
      q.processAllAvailable()
      val b3 = spark.table("sdedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(b3.contains((1L, 5L, "d")))
    } finally q.stop()
  }
}
