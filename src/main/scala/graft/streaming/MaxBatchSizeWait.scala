package graft.streaming

/** T1 — MaxBatchSizeWait accumulation semantics
  * (SINK/batchsizewait/MaxBatchSizeWait.java:27-70): after a batch is
  * processed, block until the source has accumulated a full batch again
  * (or `maxWaitMs` elapses, polling every `waitIntervalMs`), so consecutive
  * micro-batches run at ≈ the configured batch size instead of trickling
  * (throughput contract: TEST/batchsizewait/MaxBatchSizeWaitTest.java:57-78).
  *
  * In the reference the gate runs at the end of `handleBatch`, polling the
  * connector's streaming-queue size. Here it runs at the end of
  * `foreachBatch` — blocking the micro-batch thread delays the next
  * trigger, which is exactly the same back-pressure point — polling a
  * caller-supplied pending() gauge (for the file source: files accumulated
  * since the gate opened).
  */
final case class BatchSizeWaitConfig(
    maxBatchSize: Long,
    maxWaitMs: Long = 300000L,
    waitIntervalMs: Long = 10000L
) {
  require(waitIntervalMs <= maxWaitMs,
    "`wait-interval-ms` cannot be bigger than `max-wait-ms`") // MaxBatchSizeWait.initizalize
  // a zero/negative interval would make waitMs spin forever (totalWaitMs
  // never advances toward maxWaitMs)
  require(waitIntervalMs > 0, "`wait-interval-ms` must be positive")
}

object MaxBatchSizeWait {

  /** Block until `pending() >= maxBatchSize` or `maxWaitMs` total wait,
    * polling every `waitIntervalMs`; a running snapshot skips the gate
    * (the reference's snapshotRunning() bypass). Returns total waited ms.
    */
  def waitMs(pending: () => Long, cfg: BatchSizeWaitConfig,
             snapshotRunning: () => Boolean = () => false,
             sleep: Long => Unit = Thread.sleep): Long = {
    if (snapshotRunning()) return 0L
    var totalWaitMs = 0L
    while (totalWaitMs < cfg.maxWaitMs && pending() < cfg.maxBatchSize) {
      totalWaitMs += cfg.waitIntervalMs
      sleep(cfg.waitIntervalMs)
    }
    totalWaitMs
  }

  /** Pending gauge for a JSON-lines file source: events (lines) across
    * files newer than `sinceMs` in `dir`. Line counts are memoized by
    * (path, length, mtime), so across the gate's polls each file is read
    * once — subsequent ticks are pure directory-listing metadata.
    */
  def pendingFileEvents(dir: String, sinceMs: Long): () => Long = {
    val memo = scala.collection.mutable.Map.empty[(String, Long, Long), Long]
    () => {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.lastModified() >= sinceMs && !f.getName.startsWith("."))
        .map { f =>
          memo.getOrElseUpdate((f.getPath, f.length(), f.lastModified()), {
            val src = scala.io.Source.fromFile(f)
            try src.getLines().size.toLong finally src.close()
          })
        }.sum
    }
  }
}
