package graft.cdc

/** CDC operation codes and their dedup priority.
  *
  * Mirrors the reference semantics (SINK/tableoperator/Operation.java:21-26,
  * SINK/tableoperator/IcebergTableOperator.java:49-51): `c`/`i` → INSERT,
  * `u` → UPDATE, `d` → DELETE, `r` → READ (snapshot), with batch-dedup
  * priority INSERT(1) < READ(2) < UPDATE(3) < DELETE(4) — when two events
  * for the same key carry the same dedup-column value, the higher-priority
  * operation wins (a delete beats the update it follows).
  */
object Operation {
  val Insert = "c"
  val InsertAlias = "i"
  val Update = "u"
  val Delete = "d"
  val Read = "r"

  /** Op code → dedup priority (higher wins on dedup-column ties). */
  val priority: Map[String, Int] =
    Map(Insert -> 1, InsertAlias -> 1, Read -> 2, Update -> 3, Delete -> 4)

  val validOps: Set[String] = priority.keySet

  /** SQL CASE expression over an op column, usable both in Spark and as a
    * plan-stable ordering key. Unknown ops rank lowest rather than erroring
    * inside the expression; callers validate separately.
    */
  def prioritySql(opCol: String): String =
    s"CASE WHEN $opCol IN ('c','i') THEN 1 WHEN $opCol = 'r' THEN 2 " +
      s"WHEN $opCol = 'u' THEN 3 WHEN $opCol = 'd' THEN 4 ELSE 0 END"
}

/** Well-known CDC metadata column names produced by the Debezium unwrap
  * transform (reference: SINK/DebeziumConfig.java:18,77-79; FIXTURES.md §1).
  */
object CdcMeta {
  val Op = "__op"
  val SourceTsMs = "__source_ts_ms"
  val SourceTsNs = "__source_ts_ns"
  val TsMs = "__ts_ms"
  val Deleted = "__deleted"
  val Table = "__table"
  val Db = "__db"

  /** int64 fields with these names are always epoch-millis → timestamptz
    * (reference: SINK/converter/AbstractEventConverter.java:353-361).
    */
  val TsMsFields: Set[String] = Set(TsMs, SourceTsMs)
}
