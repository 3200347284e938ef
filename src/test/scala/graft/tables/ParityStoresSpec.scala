package graft.tables

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ParityStoresSpec extends AnyFunSuite with SharedSpark {

  test("offset store: single-row overwrite semantics, latest wins, readable after restart") {
    val wh = Files.createTempDirectory("graft-par").toString
    assert(ParityStores.loadOffsets(spark, wh).isEmpty)
    ParityStores.saveOffsets(spark, wh, Map("lsn" -> "41", "file" -> "a"))
    ParityStores.saveOffsets(spark, wh, Map("lsn" -> "42", "file" -> "b"))
    // exactly one row — overwrite, not append (IcebergOffsetBackingStore save)
    val t = ManagedTable.load(spark, wh, ParityStores.OffsetTable).get
    assert(t.read().count() == 1)
    // a fresh load (fresh "process") sees the latest offsets
    val restored = ParityStores.loadOffsets(spark, wh).get
    assert(restored == Map("lsn" -> "42", "file" -> "b"))
    // plain SQL queryability — the point of the parity table
    t.read().createOrReplaceTempView("offsets_view")
    assert(spark.sql("SELECT offset_data FROM offsets_view").head().getString(0).contains("42"))
  }

  test("schema history: append-only records recovered in insert order") {
    val wh = Files.createTempDirectory("graft-par2").toString
    assert(ParityStores.recoverHistory(spark, wh).isEmpty)
    ParityStores.storeHistoryRecord(spark, wh, """{"ddl":"create table a"}""")
    ParityStores.storeHistoryRecord(spark, wh, """{"ddl":"alter table a"}""")
    ParityStores.storeHistoryRecord(spark, wh, """{"ddl":"alter table a add col"}""")
    val recs = ParityStores.recoverHistory(spark, wh)
    assert(recs.size == 3)
    assert(recs.head.contains("create") && recs.last.contains("add col"))
  }
}
