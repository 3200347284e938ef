package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch exactly-once-per-key emission: keep a per-key state of the
  * last emitted version and drop replays/duplicates that arrive in LATER
  * micro-batches (within-batch dedup is [[graft.cdc.Dedup]]; this is the
  * cross-batch companion the reference cannot express at all — its only
  * cross-batch state is the target table itself, SURVEY §2.7 T6).
  *
  * Built on `flatMapGroupsWithState` (the custom-state primitive):
  * state = (last emitted dedup-ts, op-priority) per key, with a processing
  * -time TTL so state size stays bounded — keys idle longer than the TTL
  * are evicted, after which a replay would be re-emitted (documented
  * at-least-once degradation, same trade Kafka-compaction consumers make).
  *
  * Scale: state is hash-partitioned by key across executors (RocksDB/HDFS
  * state store on a real cluster); per-batch work is one shuffle of the
  * batch + state lookups. TTL bounds the store at O(active keys).
  */
object StatefulDedup {

  /** Emit rows of `df` whose (dedupCol, prio) is strictly newer than the
    * last state for their key; update state. Output columns = input
    * columns.
    *
    * `ttl = None` keeps state forever (exact, unbounded store);
    * `Some("1 hour")` turns on processing-time eviction — note the engine
    * then schedules continuous timeout-processing micro-batches even when
    * no data arrives, which is correct for long-running jobs but makes
    * drain-style tests (`processAllAvailable`) spin.
    */
  def dropStaleVersions(df: DataFrame, keyCol: String, dedupCol: String,
                        opCol: String, ttl: Option[String] = None): DataFrame = {
    val schema = df.schema
    implicit val rowEnc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(schema))
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    implicit val stateEnc: Encoder[(Long, Int)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)

    val keyIdx = schema.fieldIndex(keyCol)
    val tsIdx = schema.fieldIndex(dedupCol)
    val opIdx = schema.fieldIndex(opCol)
    // integral dedup column only — a TimestampType column would CCE in
    // getLong; convert upstream (unix_micros) like the batch Dedup does
    require(Seq("bigint", "int", "smallint", "tinyint")
      .contains(schema(dedupCol).dataType.simpleString),
      s"stateful dedup needs an integral dedup column, got " +
        s"${schema(dedupCol).dataType.simpleString} — convert with unix_micros first")
    // null-safe accessors: null ts orders first (same as batch Dedup's
    // coalesce to Long.MinValue); null/unknown op gets priority 0
    def tsOf(r: Row): Long = if (r.isNullAt(tsIdx)) Long.MinValue else r.getLong(tsIdx)
    def prioOf(r: Row): Int =
      if (r.isNullAt(opIdx)) 0
      else r.getString(opIdx) match {
        case "c" | "i" => 1
        case "r"       => 2
        case "u"       => 3
        case "d"       => 4
        case _         => 0
      }

    val timeoutConf = ttl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case None    => GroupStateTimeout.NoTimeout()
    }
    df.groupByKey(r => r.getLong(keyIdx))
      .flatMapGroupsWithState[(Long, Int), Row](OutputMode.Append(), timeoutConf) {
        (_: Long, rows: Iterator[Row], state: GroupState[(Long, Int)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val last = state.getOption.getOrElse((Long.MinValue, 0))
            // batch winner first — SAME order key as batch Dedup including
            // the tie-break: on a full (ts, prio) tie the LAST-arriving row
            // wins (maxBy alone keeps the first), so both code paths write
            // the same payload
            val winner = rows.zipWithIndex
              .maxBy { case (r, i) => (tsOf(r), prioOf(r), i) }._1
            val cand = (tsOf(winner), prioOf(winner))
            val newer = cand._1 > last._1 || (cand._1 == last._1 && cand._2 > last._2)
            if (newer) {
              state.update(cand)
              ttl.foreach(state.setTimeoutDuration)
              Iterator.single(winner)
            } else Iterator.empty
          }
      }.toDF(schema.fieldNames.toIndexedSeq: _*)
  }
}
