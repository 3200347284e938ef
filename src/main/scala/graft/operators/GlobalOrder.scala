package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Global contiguous sequence numbering — the export-time primitive that
  * stamps every row of a corpus with 1..N in key order (stable example
  * ids, shard manifests, resumable training cursors) WITHOUT the
  * single-partition global sort that `row_number() OVER (ORDER BY …)`
  * plans to.
  *
  * Shape at scale: one range exchange on the order key (each output
  * partition owns a disjoint, ordered key interval), an in-partition
  * sort, then per-partition offsets — partition sizes are counted with
  * one lightweight job over the already-materialized shuffle output
  * (map output is reused, not recomputed) and each partition adds its
  * prefix offset while streaming. No partition ever holds more than its
  * range slice; 100 TB numbers exactly as fast as it range-partitions.
  *
  * This is the one operator family where the imperative per-partition
  * escape hatch is the right call (SURVEY §2.8): the offset-prefix zip is
  * per-partition stateful iteration that no Catalyst operator expresses
  * without collapsing to one partition.
  *
  * The assignment is deterministic iff the order key is unique (ties
  * receive contiguous but arbitrary indices).
  */
object GlobalOrder {

  /** `df` plus a `seqCol` long column numbering rows 1..N ascending by
    * `orderCol`. `numPartitions` defaults to the session's shuffle
    * parallelism.
    */
  def withGlobalSeq(df: DataFrame, orderCol: String, seqCol: String = "seq",
                    numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val ranged =
      (if (numPartitions > 0) df.repartitionByRange(numPartitions, col(orderCol))
       else df.repartitionByRange(col(orderCol)))
        .sortWithinPartitions(orderCol)
    val rdd = ranged.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, ranged.schema.add(seqCol, LongType, nullable = false))
  }
}
