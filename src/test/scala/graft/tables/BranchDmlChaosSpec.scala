package graft.tables

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential for WAP-branch DML (round 9): a seeded op
  * stream — live upserts/deletes between branches; staged appends,
  * deletes, updates and merges on a branch; occasional LIVE commits
  * while a branch is active (forcing the re-stamp publish); publish or
  * abandon — against a driver-side model. The model's publish contract
  * is the deterministic reading [[ManagedTable.publishBranch]] pins:
  * replay the branch's staged ops, in stage order, on top of the
  * PUBLISH-TIME live state (adopt-in-place publishes reduce to the same
  * fold because no live commit intervened).
  */
class BranchDmlChaosSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private sealed trait Op
  private case class StAppend(rows: Seq[(Long, String)]) extends Op
  private case class StDelete(key: Long) extends Op
  private case class StUpdate(key: Long, v: String) extends Op
  private case class StMerge(rows: Seq[(Long, String)]) extends Op

  private def fold(ops: Seq[Op], base: Map[Long, String]): Map[Long, String] =
    ops.foldLeft(base) {
      case (m, StAppend(rows)) => m ++ rows
      case (m, StDelete(k))    => m - k
      // staged DML re-applies its CAPTURED rows as upserts at publish: an
      // update of k staged while k existed re-inserts k even if an
      // intervened live commit deleted it (the staged batch is later)
      case (m, StUpdate(k, v)) => m.updated(k, v)
      case (m, StMerge(rows))  => m ++ rows // matched update + unmatched insert
    }

  test("randomized branch-DML differential: view, live and publish match the model") {
    Seq(1031, 2063).foreach(runSeed)
  }

  private def runSeed(seedVal: Int): Unit = {
    val rnd = new scala.util.Random(seedVal)
    val w = java.nio.file.Files.createTempDirectory("graft-brchaos").toString
    val seed = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
    val t = ManagedTable.create(spark, w, "bc", seed.toDF("id", "v").schema, Seq("id"),
      properties = Map("write.versions-retained" -> "50"))
    t.append(seed.toDF("id", "v"))
    var live: Map[Long, String] = seed.toMap
    var branchOps: Option[Vector[Op]] = None // Some = branch "b" active
    var intervened = false // live commit landed since branch creation
    var nextId = 100L
    def freshKey(): Long = { nextId += 1; nextId }
    def viewModel: Map[Long, String] = fold(branchOps.get.toSeq, live)
    def state(): Map[Long, String] = t.read().select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def branchState(): Map[Long, String] = t.readBranch("b")
      .select("id", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    (1 to 70).foreach { step =>
      branchOps match {
        case None => rnd.nextInt(4) match {
          case 0 => // live append of fresh keys
            val rows = Seq.fill(1 + rnd.nextInt(3))((freshKey(), s"l$step"))
            t.append(rows.toDF("id", "v")); live ++= rows
          case 1 if live.nonEmpty => // live delete
            val k = live.keys.toSeq(rnd.nextInt(live.size))
            t.deleteWhere(col("id") === k); live -= k
          case 2 if live.nonEmpty => // live merge-update + insert
            val k = live.keys.toSeq(rnd.nextInt(live.size))
            val fresh = freshKey()
            val rows = Seq((k, s"lm$step"), (fresh, s"lm$step"))
            t.mergeInto(rows.toDF("id", "v")); live ++= rows
          case _ =>
            t.createBranch("b"); branchOps = Some(Vector.empty); intervened = false
        }
        case Some(ops) => rnd.nextInt(8) match {
          case 0 => // staged append: fresh keys only (append ≠ upsert)
            val rows = Seq.fill(1 + rnd.nextInt(3))((freshKey(), s"b$step"))
            t.stageAppendInto(rows.toDF("id", "v"), "b")
            branchOps = Some(ops :+ StAppend(rows))
          case 1 if viewModel.nonEmpty => // staged delete of a view key
            val k = viewModel.keys.toSeq(rnd.nextInt(viewModel.size))
            t.deleteWhereOnBranch(col("id") === k, "b")
            branchOps = Some(ops :+ StDelete(k))
          case 2 if viewModel.nonEmpty => // staged update of a view key
            val k = viewModel.keys.toSeq(rnd.nextInt(viewModel.size))
            t.updateWhereOnBranch(col("id") === k, Map("v" -> lit(s"u$step")), "b")
            branchOps = Some(ops :+ StUpdate(k, s"u$step"))
          case 3 => // staged merge: update a view key (if any) + insert fresh
            val upd = if (viewModel.nonEmpty)
              Seq((viewModel.keys.toSeq(rnd.nextInt(viewModel.size)), s"m$step"))
              else Seq.empty
            val rows = upd :+ ((freshKey(), s"m$step"))
            t.mergeInto(rows.toDF("id", "v"), stageToBranch = Some("b"))
            branchOps = Some(ops :+ StMerge(rows))
          case 4 => // INTERVENING live commit: forces the re-stamp publish —
            // including CONFLICTING ops on keys the branch also staged
            rnd.nextInt(3) match {
              case 0 =>
                val rows = Seq((freshKey(), s"iv$step"))
                t.append(rows.toDF("id", "v")); live ++= rows
              case 1 if live.nonEmpty => // live delete, possibly of a staged key
                val k = live.keys.toSeq(rnd.nextInt(live.size))
                t.deleteWhere(col("id") === k); live -= k
              case _ if live.nonEmpty => // live update of a possibly-staged key
                val k = live.keys.toSeq(rnd.nextInt(live.size))
                t.mergeInto(Seq((k, s"ivm$step")).toDF("id", "v"))
                live = live.updated(k, s"ivm$step")
              case _ =>
                val rows = Seq((freshKey(), s"iv$step"))
                t.append(rows.toDF("id", "v")); live ++= rows
            }
            intervened = true
          case 5 => // publish: replay ops on publish-time live
            t.publishBranch("b")
            live = fold(ops.toSeq, live); branchOps = None
          case 6 => // abandon: staged work vanishes
            t.abandonBranch("b"); branchOps = None
          case _ => // audit read: view matches the model when no live
            // commit intervened (with one, in-flight view ordering is
            // seq-interleaved — only the PUBLISH contract is pinned)
            if (!intervened)
              assert(branchState() == viewModel, s"step $step view diverged")
        }
      }
      if (step % 10 == 0) {
        assert(state() == live, s"step $step live diverged " +
          s"(branch active: ${branchOps.isDefined}, intervened: $intervened)")
        branchOps match {
          case Some(ops) if !intervened =>
            assert(branchState() == fold(ops.toSeq, live), s"step $step view diverged")
          case _ => ()
        }
      }
    }
    // drain: publish any open branch and do the final differential
    branchOps.foreach { ops =>
      t.publishBranch("b"); live = fold(ops.toSeq, live)
    }
    assert(state() == live, s"final state diverged (seed $seedVal)")
  }
}
