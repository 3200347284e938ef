package graft.streaming

import graft.SharedSpark
import graft.cdc.EventFactory
import graft.tables.ManagedTable
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MaxBatchSizeWaitSpec extends AnyFunSuite with SharedSpark {

  test("gate semantics: waits in intervals until a full batch is pending, bounded by max-wait") {
    // queue refills by 300 per poll; full batch = 1000 → opens after 4 polls
    var size = 0L
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val waited = MaxBatchSizeWait.waitMs(
      () => { size += 300; size },
      BatchSizeWaitConfig(maxBatchSize = 1000, maxWaitMs = 999000, waitIntervalMs = 5000),
      sleep = slept += _)
    assert(slept.size == 3 && waited == 15000,
      s"expected 3 interval sleeps then a full queue, got $slept") // 300,600,900 < 1000; 1200 opens
    // max-wait bounds a queue that never fills
    val cappedSleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val capped = MaxBatchSizeWait.waitMs(
      () => 0L,
      BatchSizeWaitConfig(maxBatchSize = 1000, maxWaitMs = 20000, waitIntervalMs = 5000),
      sleep = cappedSleeps += _)
    assert(capped == 20000 && cappedSleeps.size == 4)
    // snapshot bypass: never waits while the snapshot runs
    assert(MaxBatchSizeWait.waitMs(() => 0L,
      BatchSizeWaitConfig(1000, 20000, 5000), snapshotRunning = () => true) == 0L)
    // config contract from the reference's initizalize assertion
    assertThrows[IllegalArgumentException] {
      BatchSizeWaitConfig(maxBatchSize = 1000, maxWaitMs = 100, waitIntervalMs = 5000)
    }
  }

  test("e2e: trickled files accumulate into fewer, fuller batches behind the gate") {
    val root = Files.createTempDirectory("graft-bsw").toString
    val src = s"$root/events"; Files.createDirectories(java.nio.file.Paths.get(src))
    val cfg = PipelineConfig(warehouse = s"$root/wh")

    def writeFile(i: Int): Unit = {
      val (d, k, v) = EventFactory.event(i, s"n$i", "c", i.toLong)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = mapper.createObjectNode()
      n.put("destination", d); n.put("key", k); n.put("value", v)
      Files.write(java.nio.file.Paths.get(src, s"f$i.json"),
        mapper.writeValueAsString(n).getBytes)
    }
    writeFile(0)
    // writer thread trickles 7 more single-event files
    val writer = new Thread(() => (1 to 7).foreach { i =>
      Thread.sleep(150); writeFile(i)
    })
    writer.start()
    // gate: wait for >=4 pending events between triggers (up to 10 s)
    val q = CdcPipeline.start(spark, src, s"$root/cp", cfg,
      trigger = Trigger.ProcessingTime(0),
      batchSizeWait = Some(BatchSizeWaitConfig(maxBatchSize = 4, maxWaitMs = 10000, waitIntervalMs = 100)))
    try {
      writer.join()
      val deadline = System.currentTimeMillis() + 60000
      def count() = ManagedTable.load(spark, cfg.warehouse, "testc_inventory_customers")
        .map(_.read().count()).getOrElse(0L)
      while (count() < 8 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(count() == 8, "all trickled events must land")
      // the gate held triggers back: far fewer batches than files
      val lastBatch = graft.tables.ParityStores.loadOffsets(spark, cfg.warehouse)
        .flatMap(_.get("batchId")).map(_.toLong).get
      assert(lastBatch + 1 < 8, s"expected accumulation into <8 batches, got ${lastBatch + 1}")
    } finally q.stop()
  }
}
