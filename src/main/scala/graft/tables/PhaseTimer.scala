package graft.tables

/** Wall-clock attribution for the table write/commit path (optimization
  * instrumentation, guide §1). Accumulates nanos per named phase;
  * `report()` prints totals. Negligible overhead (two nanoTime calls per
  * phase), always on — callers are driver-side, coarse-grained operations.
  */
object PhaseTimer {
  private val acc = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val cnt = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def time[A](phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f finally {
      val d = System.nanoTime() - t0
      acc.computeIfAbsent(phase, _ => new java.util.concurrent.atomic.AtomicLong).addAndGet(d)
      cnt.computeIfAbsent(phase, _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
    }
  }

  def reset(): Unit = { acc.clear(); cnt.clear() }

  def report(): String = {
    import scala.jdk.CollectionConverters._
    acc.asScala.toSeq.sortBy(-_._2.get).map { case (k, v) =>
      f"$k%-28s ${v.get / 1e9}%8.3f s  n=${cnt.get(k).get}%d"
    }.mkString("\n")
  }
}
