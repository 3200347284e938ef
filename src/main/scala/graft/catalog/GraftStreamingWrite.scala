package graft.catalog

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

import graft.tables.{LocalCommit, ManagedTable}

/** `writeStream.toTable("<cat>.t")` — connector-native streaming writes
  * through the V2 catalog, the last write verb the seam didn't declare
  * (`writeStream.format("graft-table")` and `foreachBatch` remain the V1
  * spellings; all three land through the ONE [[ManagedTable]] commit
  * protocol).
  *
  * Shape per micro-batch (the same staged-delta machinery as
  * [[GraftDynamicOverwriteWrite]]): executor tasks stream their rows into
  * per-epoch staged parquet files — distributed, unbuffered, commit
  * messages carry only paths — and the driver commit reads the staged
  * batch back distributed and lands ONE managed commit (append for
  * Append mode; whole-table overwrite for Complete mode, which Spark
  * requests via the builder's truncate()). The batch therefore gets full
  * write-path parity: tuple splitting, write clustering, stats/blooms/
  * NDV, rolling file sizes.
  *
  * EXACTLY-ONCE across failures: each epoch's commit stamps
  * `streaming.v2.epoch.<queryId>` into the SAME commit's pointer flip
  * ([[ManagedTable.append]]'s commitProperties — the V1 sink's
  * replay-marker discipline, cf. [[graft.cdc.Replicate]]). A crash
  * between the table commit and the checkpoint advance re-delivers the
  * epoch; the freshly-loaded marker detects it already landed and the
  * replay becomes a no-op instead of a duplicate append. Empty Append
  * epochs commit nothing (appending zero rows is idempotent by itself).
  *
  * At 100 TB this is O(batch) end to end: staging is one extra
  * materialization OF THE BATCH (never the table), the commit is a
  * manifest diff, and the marker check is one metadata read per epoch.
  *
  * Refuses under an active `spark.wap.branch` at commit time: a stream
  * commits continuously, and silently staging an unbounded commit
  * sequence onto an audit branch is a trap — stop the stream or unset
  * the branch.
  */
private[catalog] final class GraftStreamingWrite(
    t: ManagedTable, info: LogicalWriteInfo, truncateEachEpoch: Boolean)
    extends StreamingWrite {

  private val spark = SparkSession.active
  private val stagingRoot = new Path(t.v2TableDir, s"_stream_staging/${info.queryId}")
  // all-nullable staged shape: the managed write conforms/casts on land
  private val stagedSchema = StructType(info.schema().fields.map(_.copy(nullable = true)))
  private val markerKey = s"streaming.v2.epoch.${info.queryId}"

  override def createStreamingWriterFactory(pinfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (conf, codec) = LocalCommit.prepareWriteConf(spark, stagedSchema)
    new GraftStreamingStagedWriterFactory(stagingRoot.toString,
      new SerializableConfiguration(conf), codec.name())
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingRoot.getFileSystem(spark.sessionState.newHadoopConf())
    val epochDir = new Path(stagingRoot, epochId.toString)
    try {
      GraftV2Table.activeWapBranch.foreach { b =>
        throw new UnsupportedOperationException(
          s"graft V2 catalog: streaming write to ${t.name} cannot target WAP " +
            s"branch '$b' — a stream commits continuously; stop the stream or " +
            "unset spark.wap.branch")
      }
      // replay guard: a fresh load sees the marker the LAST successful
      // commit's pointer flip carried — at or above this epoch means the
      // batch already landed and this is a post-crash re-delivery
      val landed = ManagedTable.load(spark, t.warehouse, t.meta.name)
        .flatMap(_.meta.properties.get(markerKey)).exists(_.toLong >= epochId)
      if (landed) return
      val files = messages.collect {
        case m: GraftDeltaCommitMessage if m.rows > 0L => m.path
      }.toIndexedSeq
      val props = Map(markerKey -> epochId.toString)
      if (truncateEachEpoch) {
        // Complete mode: the epoch's result set REPLACES the table —
        // including an empty one (an aggregation can legally drain empty)
        val staged =
          if (files.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stagedSchema)
          else spark.read.schema(stagedSchema).parquet(files: _*)
        t.overwrite(staged, props)
      } else if (files.nonEmpty) {
        t.append(spark.read.schema(stagedSchema).parquet(files: _*), props)
      }
    } finally fs.delete(epochDir, true)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingRoot.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(stagingRoot, epochId.toString), true)
  }
}

/** Epoch-aware twin of [[GraftStagedWriterFactory]]: each task's file
  * stages under the epoch's own directory, so abort/commit cleanup is one
  * recursive delete and replayed epochs cannot collide with live ones.
  */
private[catalog] final class GraftStreamingStagedWriterFactory(
    stagingRoot: String, conf: SerializableConfiguration, codecName: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftStagedWriter(s"$stagingRoot/$epochId", conf, codecName,
      partitionId, taskId)
}
