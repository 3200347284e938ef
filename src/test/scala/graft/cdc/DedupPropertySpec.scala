package graft.cdc

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property tests for the C2 dedup contract (SURVEY §5 test plan):
  * winner correctness against a plain-Scala reference fold, and
  * permutation invariance — over seeded random batches with dense
  * key/ts collisions.
  */
class DedupPropertySpec extends AnyFunSuite with SharedSpark {

  private case class Ev(key: Long, op: String, ts: Long, payload: Int)

  private val ops = Vector("c", "i", "r", "u", "d")
  private val prio = Map("c" -> 1, "i" -> 1, "r" -> 2, "u" -> 3, "d" -> 4)

  private def randomBatch(seed: Int, n: Int): List[Ev] = {
    val rnd = new Random(seed)
    List.fill(n)(Ev(rnd.nextInt(6).toLong, ops(rnd.nextInt(5)),
      rnd.nextInt(4).toLong, rnd.nextInt(1000)))
  }

  /** The reference semantics: fold in arrival order, keep the current
    * winner only on strictly greater (ts, prio) — the LATER event wins
    * full ties (compareByTsThenOp(old, new) <= 0 returns newValue,
    * IcebergTableOperator.java:80-84).
    */
  private def referenceWinners(evs: List[Ev]): Map[Long, Ev] =
    evs.foldLeft(Map.empty[Long, Ev]) { (acc, e) =>
      acc.get(e.key) match {
        case Some(w) if w.ts > e.ts || (w.ts == e.ts && prio(w.op) > prio(e.op)) => acc
        case _ => acc.updated(e.key, e)
      }
    }

  private def sparkWinners(evs: List[Ev]): Map[Long, (String, Long, Int)] = {
    import spark.implicits._
    val df = evs.map(e => (e.key, e.op, e.ts, e.payload))
      .toDF("user_key", "__op", "ts", "payload")
    Dedup.deduplicate(df, Seq("user_key"), "ts")
      .collect()
      .map(r => r.getAs[Long]("user_key") ->
        ((r.getAs[String]("__op"), r.getAs[Long]("ts"), r.getAs[Int]("payload"))))
      .toMap
  }

  test("dedup matches the reference fold on random batches") {
    for (seed <- 1 to 8) {
      val evs = randomBatch(seed, 30)
      val expect = referenceWinners(evs).map { case (k, e) => k -> ((e.op, e.ts, e.payload)) }
      assert(sparkWinners(evs) == expect, s"seed=$seed")
    }
  }

  test("winner (key, priority, ts) is invariant under permutation") {
    for (seed <- 1 to 5) {
      val evs = randomBatch(100 + seed, 20)
      val a = sparkWinners(evs).map { case (k, (op, ts, _)) => (k, prio(op), ts) }.toSet
      val b = sparkWinners(evs.reverse).map { case (k, (op, ts, _)) => (k, prio(op), ts) }.toSet
      // payloads can differ when (ts, prio) ties across different events;
      // the winner's (key, op-priority, ts) cannot
      assert(a == b, s"seed=$seed")
    }
  }

  test("full (ts, priority) tie keeps the LAST-arriving event, like the reference") {
    import spark.implicits._
    // identical key/ts/op — only arrival order differs (ArrivalCol explicit)
    val df = Seq((1L, "u", 5L, 100, 0L), (1L, "u", 5L, 200, 1L), (1L, "u", 5L, 300, 2L))
      .toDF("user_key", "__op", "ts", "payload", Dedup.ArrivalCol)
    val out = Dedup.deduplicate(df, Seq("user_key"), "ts").collect()
    assert(out.length == 1 && out.head.getAs[Int]("payload") == 300)
  }

  test("timestamp-typed dedup column preserves sub-second ordering") {
    import spark.implicits._
    // 10:00:00.000200 beats 10:00:00.000900 only if micros survive; a
    // cast-to-seconds collapse would fall through to op-priority (d > u)
    val df = Seq(
      (1L, "d", java.sql.Timestamp.valueOf("2024-01-01 10:00:00.0002"), 1),
      (1L, "u", java.sql.Timestamp.valueOf("2024-01-01 10:00:00.0009"), 2)
    ).toDF("user_key", "__op", "ts", "payload")
    val out = Dedup.deduplicate(df, Seq("user_key"), "ts").collect()
    assert(out.length == 1 && out.head.getAs[Int]("payload") == 2,
      "later sub-second timestamp must win over higher op priority")
  }

  test("null identifier field: Fail policy raises, Drop policy filters the row") {
    import spark.implicits._
    val batch = Seq(
      (Some(1L), "c", 1L, 10), (Option.empty[Long], "c", 1L, 99)
    ).toDF("user_key", "__op", "ts", "payload")
    val empty = batch.limit(0)

    val ex = intercept[Exception] {
      CdcApply.upsert(empty, batch, Seq("user_key"),
        CdcApply.UpsertConfig(dedupColumn = "ts",
          nullKeyPolicy = CdcApply.NullKeyPolicy.Fail)).collect()
    }
    assert(ex.getMessage.contains("null identifier field") ||
      Option(ex.getCause).exists(_.getMessage.contains("null identifier field")), ex.getMessage)

    val dropped = CdcApply.upsert(empty, batch, Seq("user_key"),
      CdcApply.UpsertConfig(dedupColumn = "ts",
        nullKeyPolicy = CdcApply.NullKeyPolicy.Drop))
    assert(dropped.select("user_key").as[Long].collect().toSeq == Seq(1L))
  }

  test("upsert hard-delete nets inserts+deletes to nothing") {
    import spark.implicits._
    val batch = Seq(
      (1L, "c", 1L, 10), (1L, "d", 2L, 0),   // insert then delete → gone
      (2L, "d", 1L, 0),                      // delete of absent key → gone
      (3L, "c", 1L, 30)                      // plain insert → stays
    ).toDF("user_key", "__op", "ts", "payload")
    val empty = batch.limit(0)
    val out = CdcApply.upsert(empty, batch, Seq("user_key"),
      CdcApply.UpsertConfig(keepDeletes = false, dedupColumn = "ts"))
    assert(out.select("user_key").as[Long].collect().toSeq == Seq(3L))
  }
}
