package graft.cdc

import graft.SharedSpark
import graft.tables.ManagedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-exact graft→graft replication ([[Replicate.syncOnce]]):
  * seed + incremental catch-up equivalence, hard deletes, exactly-once
  * markers, barrier reseed, schema evolution, and the refusal guards.
  */
class ReplicateSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def wh = java.nio.file.Files.createTempDirectory("graft-repl").toString

  private def rows(t: (Int, String, Long)*): DataFrame =
    t.toSeq.toDF("id", "name", "v")

  private def state(t: ManagedTable): Set[(Int, String, Long)] =
    t.read().select("id", "name", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  test("seed + incremental syncs mirror the upstream exactly, including hard deletes") {
    val w = wh
    val src = ManagedTable.create(spark, w, "up", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "down", rows().schema, Seq("id"))
    src.append(rows((1, "a", 1L), (2, "b", 2L), (3, "c", 3L)))
    // initial seed
    assert(Replicate.syncOnce(src, dst) == src.meta.currentVersion)
    assert(state(dst) == state(src))
    val seededV = dst.meta.currentVersion
    // no-change re-sync: zero commits, marker already current
    assert(Replicate.syncOnce(src, dst) == src.meta.currentVersion)
    assert(dst.meta.currentVersion == seededV, "idle sync must not commit")
    // incremental: update + insert + a hard delete across THREE upstream
    // commits (native DML — each produces changelog rows/tombstones)
    src.updateWhere(col("id") === 2, Map("name" -> lit("b2"), "v" -> lit(20L)))
    src.append(rows((4, "d", 4L)))
    src.deleteWhere(col("id") === 1)
    val synced = Replicate.syncOnce(
      ManagedTable.load(spark, w, "up").get, ManagedTable.load(spark, w, "down").get)
    val src2 = ManagedTable.load(spark, w, "up").get
    val dst2 = ManagedTable.load(spark, w, "down").get
    assert(synced == src2.meta.currentVersion)
    assert(state(dst2) == state(src2))
    assert(state(dst2) == Set((2, "b2", 20L), (3, "c", 3L), (4, "d", 4L)))
    // exactly-once marker rode the apply commit
    assert(dst2.meta.properties(Replicate.markerKey(src2)).toLong == src2.meta.currentVersion)
    // replayed catch-up (crash between apply and nothing — the marker is
    // atomic with the apply) is a no-op
    val vAfter = dst2.meta.currentVersion
    Replicate.syncOnce(src2, dst2)
    assert(dst2.meta.currentVersion == vAfter)
  }

  test("a changelog barrier upstream (overwrite/compact) forces a reseed that converges") {
    val w = wh
    val src = ManagedTable.create(spark, w, "up2", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "down2", rows().schema, Seq("id"))
    src.append(rows((1, "a", 1L), (2, "b", 2L)))
    Replicate.syncOnce(src, dst)
    // upstream rewrite WITHOUT tombstones: rows vanish from the changelog
    src.overwrite(rows((2, "B", 20L), (5, "e", 5L)))
    src.append(rows((6, "f", 6L)))
    val src2 = ManagedTable.load(spark, w, "up2").get
    val dst2 = ManagedTable.load(spark, w, "down2").get
    Replicate.syncOnce(src2, dst2)
    assert(state(ManagedTable.load(spark, w, "down2").get) == state(src2))
    assert(state(src2) == Set((2, "B", 20L), (5, "e", 5L), (6, "f", 6L)))
    // full compact is also a barrier; replica still converges
    src2.compact()
    src2.append(rows((7, "g", 7L)))
    val src3 = ManagedTable.load(spark, w, "up2").get
    Replicate.syncOnce(src3, ManagedTable.load(spark, w, "down2").get)
    assert(state(ManagedTable.load(spark, w, "down2").get) == state(src3))
  }

  test("a keyed metadata region delete upstream is a barrier; the replica reseeds and converges") {
    val w = wh
    val df = (1 to 40).map(i => (i, s"n$i", (i % 4).toLong)).toDF("id", "name", "v")
    val src = ManagedTable.create(spark, w, "upk", df.schema, Seq("id"), Seq("v"))
    val dst = ManagedTable.create(spark, w, "downk", df.schema, Seq("id"), Seq("v"))
    src.append(df)
    Replicate.syncOnce(src, dst)
    // keyed pure-region delete: manifest diff, rows vanish with NO
    // tombstones — only the barrier tells the replica
    val files = src.filesMetadata().select("path").as[String].collect().toSet
    src.deleteWhere(col("v").isin(1L, 2L))
    assert(src.filesMetadata().select("path").as[String].collect().toSet
        .subsetOf(files), "precondition: the delete took the metadata route")
    src.append(Seq((100, "x", 3L)).toDF("id", "name", "v"))
    val src2 = ManagedTable.load(spark, w, "upk").get
    Replicate.syncOnce(src2, ManagedTable.load(spark, w, "downk").get)
    assert(state(ManagedTable.load(spark, w, "downk").get) == state(src2))
    assert(!state(src2).exists(r => r._3 == 1L || r._3 == 2L))
  }

  test("upstream schema evolution flows through: new columns appear with nulls downstream") {
    val w = wh
    val src = ManagedTable.create(spark, w, "up3", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "down3", rows().schema, Seq("id"))
    src.append(rows((1, "a", 1L)))
    Replicate.syncOnce(src, dst)
    val evolved = Seq((2, "b", 2L, "extra")).toDF("id", "name", "v", "note")
    src.evolve(evolved.schema)
    src.append(evolved)
    val src2 = ManagedTable.load(spark, w, "up3").get
    val dst2 = ManagedTable.load(spark, w, "down3").get
    Replicate.syncOnce(src2, dst2)
    val d = ManagedTable.load(spark, w, "down3").get.read()
    assert(d.schema.fieldNames.contains("note"))
    assert(d.where(col("id") === 2).select("note").head().getString(0) == "extra")
    assert(d.where(col("id") === 1).select("note").head().isNullAt(0),
      "pre-evolution replica rows must read null for the new column")
  }

  test("a refused non-replica destination is left UNTOUCHED (no schema mutation)") {
    val w = wh
    val src = ManagedTable.create(spark, w, "up5",
      Seq((1, "a", 1L, "x")).toDF("id", "name", "v", "extra").schema, Seq("id"))
    src.append(Seq((1, "a", 1L, "x")).toDF("id", "name", "v", "extra"))
    val precious = ManagedTable.create(spark, w, "d5", rows().schema, Seq("id"))
    precious.append(rows((9, "z", 9L)))
    val schemaBefore = precious.meta.schema
    intercept[IllegalArgumentException] { Replicate.syncOnce(src, precious) }
    assert(ManagedTable.load(spark, w, "d5").get.meta.schema == schemaBefore,
      "refusal must not evolve the refused table's schema")
  }

  test("an in-range commit netting to zero rows still advances the marker") {
    val w = wh
    // a CDC-built upstream: its schema carries the __op meta column, so
    // an EMPTY micro-batch merge commits a 0-row upsert group (the
    // pipeline shape that nets to zero changelog rows)
    val cdcSchema = rows().withColumn("__op", lit("c")).schema
    val src = ManagedTable.create(spark, w, "up6", cdcSchema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "down6", cdcSchema, Seq("id"))
    src.append(rows((1, "a", 1L)).withColumn("__op", lit("c")))
    Replicate.syncOnce(src, dst)
    src.merge(rows().withColumn("__op", lit("c")),
      CdcApply.UpsertConfig(keepDeletes = false, runDedup = false))
    val src2 = ManagedTable.load(spark, w, "up6").get
    val dst2 = ManagedTable.load(spark, w, "down6").get
    assert(Replicate.syncOnce(src2, dst2) == src2.meta.currentVersion)
    assert(dst2.meta.properties(Replicate.markerKey(src2)).toLong ==
      src2.meta.currentVersion,
      "marker must advance past a zero-row range or every poll re-reads it")
    // and the next poll is a real no-op
    val v = ManagedTable.load(spark, w, "down6").get.meta.currentVersion
    Replicate.syncOnce(src2, ManagedTable.load(spark, w, "down6").get)
    assert(ManagedTable.load(spark, w, "down6").get.meta.currentVersion == v)
  }

  test("keyless (log-shape) upstream replicates by range re-append; barrier reseeds") {
    val w = wh
    val src = ManagedTable.create(spark, w, "kl", rows().schema, Seq.empty)
    val dst = ManagedTable.create(spark, w, "kld", rows().schema, Seq.empty)
    src.append(rows((1, "a", 1L), (2, "b", 2L)))
    Replicate.syncOnce(src, dst)
    // two incremental appends, incl. a duplicate row — keyless semantics
    // keep both copies, and the replica must too
    src.append(rows((3, "c", 3L)))
    src.append(rows((3, "c", 3L), (4, "d", 4L)))
    Replicate.syncOnce(ManagedTable.load(spark, w, "kl").get,
      ManagedTable.load(spark, w, "kld").get)
    def multiset(n: String) = ManagedTable.load(spark, w, n).get.read()
      .select("id", "name", "v").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(multiset("kld") == multiset("kl"))
    assert(multiset("kld").count(_._1 == 3) == 2, "duplicate log rows must replicate as-is")
    // a metadata-region delete upstream is a barrier: replica reseeds
    val srcP = ManagedTable.create(spark, w, "klp",
      rows((1, "a", 1L)).schema, Seq.empty, Seq("name"))
    val dstP = ManagedTable.create(spark, w, "klpd", rows().schema, Seq.empty)
    srcP.append(rows((1, "a", 1L), (2, "b", 2L), (3, "a", 3L)))
    Replicate.syncOnce(srcP, dstP)
    srcP.deleteWhere(col("name") === "a") // metadata drop, barrier-stamped
    srcP.append(rows((5, "e", 5L)))
    Replicate.syncOnce(ManagedTable.load(spark, w, "klp").get,
      ManagedTable.load(spark, w, "klpd").get)
    assert(multiset("klpd") == multiset("klp"))
    assert(multiset("klp") == Seq((2, "b", 2L), (5, "e", 5L)))
  }

  test("follow(): streamed catch-up converges, restart resumes, barrier reseeds") {
    val w = wh
    val ck = java.nio.file.Files.createTempDirectory("graft-repl-ck").toString
    val src = ManagedTable.create(spark, w, "fup", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "fdown", rows().schema, Seq("id"))
    src.append(rows((1, "a", 1L), (2, "b", 2L)))
    // a trickle of three commits, then one AvailableNow follow pass
    src.updateWhere(col("id") === 1, Map("v" -> lit(10L)))
    src.append(rows((3, "c", 3L)))
    src.deleteWhere(col("id") === 2)
    Replicate.follow(src, dst, ck).awaitTermination(60000)
    val src1 = ManagedTable.load(spark, w, "fup").get
    assert(state(ManagedTable.load(spark, w, "fdown").get) == state(src1))
    assert(state(src1) == Set((1, "a", 10L), (3, "c", 3L)))

    // restart from the same checkpoint: resumes, applies only the new range
    src1.append(rows((4, "d", 4L)))
    Replicate.follow(src1, ManagedTable.load(spark, w, "fdown").get, ck)
      .awaitTermination(60000)
    val d2 = ManagedTable.load(spark, w, "fdown").get
    assert(state(d2) == state(ManagedTable.load(spark, w, "fup").get))
    assert(d2.meta.properties(Replicate.markerKey(src1)).toLong ==
      ManagedTable.load(spark, w, "fup").get.meta.currentVersion)

    // a barrier upstream (overwrite) reseeds through the same loop
    val src2 = ManagedTable.load(spark, w, "fup").get
    src2.overwrite(rows((9, "z", 9L)))
    Replicate.follow(src2, ManagedTable.load(spark, w, "fdown").get, ck)
      .awaitTermination(60000)
    assert(state(ManagedTable.load(spark, w, "fdown").get) == Set((9, "z", 9L)))

    // a METADATA-ONLY upstream commit (truncate: one empty manifest,
    // ZERO data files written) must still wake the follower — the
    // commit stream fires per manifest, where a data-file stream would
    // sleep through it and serve the truncated rows forever
    val src3 = ManagedTable.load(spark, w, "fup").get
    src3.truncate()
    Replicate.follow(src3, ManagedTable.load(spark, w, "fdown").get, ck)
      .awaitTermination(60000)
    val d3 = ManagedTable.load(spark, w, "fdown").get
    assert(state(d3).isEmpty, "metadata-only commit did not wake the follower")
    assert(d3.meta.properties(Replicate.markerKey(src3)).toLong ==
      ManagedTable.load(spark, w, "fup").get.meta.currentVersion)

    // following onto a non-replica destination fails before starting
    val stranger = ManagedTable.create(spark, w, "fstr", rows().schema, Seq("id"))
    stranger.append(rows((5, "e", 5L)))
    val e = intercept[IllegalArgumentException] {
      Replicate.follow(ManagedTable.load(spark, w, "fup").get, stranger,
        java.nio.file.Files.createTempDirectory("graft-repl-ck2").toString)
    }
    assert(e.getMessage.contains("refusing to follow"))
  }

  test("tags mirror: sync-time tags split exactly, retroactive boundary tags map, " +
      "pins survive retention, drops flow through") {
    val w = wh
    val src = ManagedTable.create(spark, w, "tup", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "tdown", rows().schema, Seq("id"))
    src.setProperties(Map("write.versions-retained" -> "10"))
    dst.setProperties(Map("write.versions-retained" -> "10"))

    src.append(rows((1, "a", 1L)))
    Replicate.syncOnce(src, dst)
    // a tag INSIDE the next catch-up range: the apply must split at it so
    // the replica owns a snapshot with exactly the tagged state
    src.append(rows((2, "b", 2L)))
    src.tag("mid") // pins the version holding {1, 2}
    src.append(rows((3, "c", 3L)))
    val src1 = ManagedTable.load(spark, w, "tup").get
    val dst1 = ManagedTable.load(spark, w, "tdown").get
    Replicate.syncOnce(src1, dst1)
    def tagState(t: ManagedTable, name: String): Set[(Int, String, Long)] =
      t.readRef(name).select("id", "name", "v").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val d1 = ManagedTable.load(spark, w, "tdown").get
    assert(tagState(d1, "mid") == tagState(src1, "mid"))
    assert(tagState(d1, "mid") == Set((1, "a", 1L), (2, "b", 2L)),
      "the mirrored tag must pin the MID-range state, not the sync target")

    // retroactive tag at a SYNC BOUNDARY: the version map remembers which
    // replica snapshot held that upstream version
    val boundaryV = ManagedTable.load(spark, w, "tup").get.meta.currentVersion
    src1.append(rows((4, "d", 4L)))
    Replicate.syncOnce(ManagedTable.load(spark, w, "tup").get,
      ManagedTable.load(spark, w, "tdown").get)
    val src2 = ManagedTable.load(spark, w, "tup").get
    src2.tag("old", boundaryV)
    // caught-up poll: ZERO data commits, the mirror pass alone picks it up
    Replicate.syncOnce(src2, ManagedTable.load(spark, w, "tdown").get)
    val d2 = ManagedTable.load(spark, w, "tdown").get
    assert(tagState(d2, "old") == tagState(src2, "old"))
    assert(tagState(d2, "old") == Set((1, "a", 1L), (2, "b", 2L), (3, "c", 3L)))

    // the mirrored pin survives replica retention: churn well past the
    // retention window and the tagged snapshot must stay readable
    var s = src2
    (5 to 9).foreach { i =>
      s.append(rows((i, s"x$i", i.toLong)))
      Replicate.syncOnce(ManagedTable.load(spark, w, "tup").get,
        ManagedTable.load(spark, w, "tdown").get)
      s = ManagedTable.load(spark, w, "tup").get
    }
    val d3 = ManagedTable.load(spark, w, "tdown").get
    assert(tagState(d3, "mid") == Set((1, "a", 1L), (2, "b", 2L)),
      "GC must not expire a snapshot a mirrored tag pins")

    // upstream drop expires the mirrored tag; a replica-LOCAL tag is the
    // replica's own and never follows upstream state
    d3.tag("local-only")
    s.dropTag("mid")
    Replicate.syncOnce(ManagedTable.load(spark, w, "tup").get,
      ManagedTable.load(spark, w, "tdown").get)
    val d4 = ManagedTable.load(spark, w, "tdown").get
    assert(!d4.tags().contains("mid"), "upstream drop must flow through")
    assert(d4.tags().contains("local-only"), "local tags are not mirror-owned")
    assert(d4.tags().contains("old"), "unrelated mirrored tags survive")
  }

  test("tags mirror: unmirrorable and name-conflicting tags are skipped VISIBLY, not fatally") {
    val w = wh
    val src = ManagedTable.create(spark, w, "uup", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "udown", rows().schema, Seq("id"))
    src.setProperties(Map("write.versions-retained" -> "10"))
    src.append(rows((1, "a", 1L)))
    Replicate.syncOnce(src, dst)
    // two upstream commits collapse into ONE apply: the interior version
    // has no replica snapshot, so a retroactive tag on it can't mirror
    src.append(rows((2, "b", 2L)))
    src.append(rows((3, "c", 3L)))
    val interiorV = ManagedTable.load(spark, w, "uup").get.meta.currentVersion - 1
    Replicate.syncOnce(ManagedTable.load(spark, w, "uup").get,
      ManagedTable.load(spark, w, "udown").get)
    val src1 = ManagedTable.load(spark, w, "uup").get
    src1.tag("interior", interiorV)
    // and a name CONFLICT: the replica already owns this name locally
    val dst1 = ManagedTable.load(spark, w, "udown").get
    dst1.tag("clash")
    val localPin = dst1.tags()("clash")
    src1.tag("clash")
    Replicate.syncOnce(src1, ManagedTable.load(spark, w, "udown").get)
    val d = ManagedTable.load(spark, w, "udown").get
    assert(!d.tags().contains("interior"))
    assert(d.tags()("clash") == localPin, "a local tag must never be clobbered")
    val un = d.meta.properties(Replicate.unmirroredKey(src1)).split(',').toSet
    assert(un == Set("interior", "clash"),
      "skipped tags must be VISIBLE in the unmirrored property")
    // the skip is not fatal: replication itself keeps converging
    src1.append(rows((4, "d", 4L)))
    Replicate.syncOnce(ManagedTable.load(spark, w, "uup").get,
      ManagedTable.load(spark, w, "udown").get)
    assert(state(ManagedTable.load(spark, w, "udown").get) ==
      state(ManagedTable.load(spark, w, "uup").get))
  }

  test("follow() mirrors tags on the next wake") {
    val w = wh
    val ck = java.nio.file.Files.createTempDirectory("graft-repl-tck").toString
    val src = ManagedTable.create(spark, w, "ftup", rows().schema, Seq("id"))
    val dst = ManagedTable.create(spark, w, "ftdown", rows().schema, Seq("id"))
    src.setProperties(Map("write.versions-retained" -> "10"))
    src.append(rows((1, "a", 1L)))
    src.tag("release")
    // the tag rides the wake the data commit fires
    Replicate.follow(src, dst, ck).awaitTermination(60000)
    val d = ManagedTable.load(spark, w, "ftdown").get
    assert(d.tags().contains("release"))
    assert(d.readRef("release").count() == 1)
  }

  test("chaos fold: random DML + tag churn + syncs keep every mirrored tag " +
      "content-equal and every skip visible") {
    val w = wh
    val rnd = new scala.util.Random(42)
    val src0 = ManagedTable.create(spark, w, "cup", rows().schema, Seq("id"))
    val dst0 = ManagedTable.create(spark, w, "cdown", rows().schema, Seq("id"))
    src0.setProperties(Map("write.versions-retained" -> "12"))
    dst0.setProperties(Map("write.versions-retained" -> "12"))
    def up = ManagedTable.load(spark, w, "cup").get
    def down = ManagedTable.load(spark, w, "cdown").get
    var nextId = 0
    var nextTag = 0
    (1 to 30).foreach { _ =>
      val u = up
      rnd.nextInt(10) match {
        case 0 | 1 | 2 =>
          nextId += 1
          u.append(rows((nextId, s"a$nextId", nextId.toLong)))
        case 3 =>
          if (nextId > 0)
            u.updateWhere(col("id") === (rnd.nextInt(nextId) + 1),
              Map("v" -> lit(999L)))
        case 4 =>
          if (nextId > 0) u.deleteWhere(col("id") === (rnd.nextInt(nextId) + 1))
        case 5 =>
          // a retroactive tag at a random RETAINED version (may or may not
          // be a sync boundary — the mirror must be exact or visibly skip)
          val vs = u.versions().map(_._1)
          if (vs.nonEmpty) {
            nextTag += 1
            u.tag(s"t$nextTag", vs(rnd.nextInt(vs.length)))
          }
        case 6 =>
          val live = u.tags().keys.toSeq.sorted
          if (live.nonEmpty) u.dropTag(live(rnd.nextInt(live.length)))
        case 7 =>
          // a barrier: reseed path; previously-mirrored tags stay valid
          // (both sides' pins are immutable), unmirrored ones stay skipped
          if (rnd.nextBoolean() && nextId > 0)
            u.overwrite(rows((nextId, s"ow$nextId", nextId.toLong)))
        case _ =>
          Replicate.syncOnce(u, down)
      }
    }
    Replicate.syncOnce(up, down)
    val u = up
    val d = down
    assert(state(d) == state(u), "replica diverged from upstream")
    val unmirrored = d.meta.properties.get(Replicate.unmirroredKey(u))
      .map(_.split(',').toSet).getOrElse(Set.empty)
    u.tags().foreach { case (n, sv) =>
      if (d.tags().contains(n)) {
        val us = u.readVersion(sv).select("id", "name", "v").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
        val ds = d.readRef(n).select("id", "name", "v").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
        assert(ds == us, s"mirrored tag '$n' pins the wrong content")
      } else assert(unmirrored.contains(n),
        s"tag '$n' neither mirrored nor visibly skipped")
    }
    // no stale mirror-owned tags: every replica tag the mirror owns still
    // exists upstream
    val owned = d.meta.properties.get(Replicate.mirroredKey(u))
      .map(_.split(',').toSet).getOrElse(Set.empty)
    owned.foreach(n => assert(u.tags().contains(n),
      s"mirror-owned replica tag '$n' outlived its upstream tag"))
  }

  test("refusals: non-replica destination, mismatched keys") {
    val w = wh
    val src = ManagedTable.create(spark, w, "up4", rows().schema, Seq("id"))
    src.append(rows((1, "a", 1L)))
    val otherKey = ManagedTable.create(spark, w, "d2", rows().schema, Seq("name"))
    intercept[IllegalArgumentException] { Replicate.syncOnce(src, otherKey) }
    // a table with its own history and no marker must not be clobbered
    val notAReplica = ManagedTable.create(spark, w, "d3", rows().schema, Seq("id"))
    notAReplica.append(rows((9, "z", 9L)))
    intercept[IllegalArgumentException] { Replicate.syncOnce(src, notAReplica) }
  }
}
