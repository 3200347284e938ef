package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The `bucket` function of the graft V2 catalog — the partition transform
  * behind storage-partitioned joins.
  *
  * CONTRACT: must compute exactly what the write path computes for the
  * `bucket(col, N)` partition transform, `pmod(hash(col), N)`
  * ([[graft.tables.PartitionSpecParser]]) — Spark's Murmur3 with seed 42,
  * i.e. the SAME partitioning `HashPartitioning(col, N)` would produce.
  * Catalyst resolves scan-reported `KeyGroupedPartitioning` keys through
  * this catalog function ([[GraftCatalog.loadFunction]]), compares both
  * join sides by its [[BoundFunction.canonicalName]], and may evaluate it
  * to re-shuffle a non-partitioned side onto the table's layout
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) — Iceberg's
  * SparkFunctions design (reference tables delegate partitioning to
  * Iceberg's bucket transform the same way).
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, col): graft bucket partition transform — pmod(murmur3_hash(col), n)"

  /** Unbindable shapes throw [[UnsupportedOperationException]] — the ONE
    * exception Catalyst's SPJ function resolution catches and degrades to
    * an unpartitioned (shuffled) plan on; anything else would fail the
    * whole query at planning.
    */
  override def bind(inputType: StructType): BoundFunction = {
    if (inputType.fields.length != 2 || inputType.fields(0).dataType != IntegerType)
      throw new UnsupportedOperationException(
        s"graft bucket expects (numBuckets int, col), got ${inputType.catalogString}")
    val keyType = inputType.fields(1).dataType
    if (!BoundBucket.supported(keyType))
      throw new UnsupportedOperationException(
        s"graft bucket: unsupported key type ${keyType.catalogString} " +
          "(supported: integral, date, timestamp, string, binary)")
    BoundBucket(keyType)
  }
}

final case class BoundBucket(keyType: DataType)
    extends ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def isResultNullable: Boolean = false
  // equal across both join sides iff the key type matches — the SPJ
  // compatibility check compares canonical names
  override def canonicalName(): String = s"graft.bucket(${keyType.catalogString})"

  override def produceResult(input: InternalRow): java.lang.Integer = {
    val n = input.getInt(0)
    // Spark's hash() of a null child leaves the seed untouched
    val h: Int =
      if (input.isNullAt(1)) BoundBucket.Seed
      else keyType match {
        case ByteType    => Murmur3_x86_32.hashInt(input.getByte(1).toInt, BoundBucket.Seed)
        case ShortType   => Murmur3_x86_32.hashInt(input.getShort(1).toInt, BoundBucket.Seed)
        case IntegerType | DateType =>
          Murmur3_x86_32.hashInt(input.getInt(1), BoundBucket.Seed)
        case LongType | TimestampType | TimestampNTZType =>
          Murmur3_x86_32.hashLong(input.getLong(1), BoundBucket.Seed)
        case StringType =>
          val s = input.getUTF8String(1)
          Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, BoundBucket.Seed)
        case BinaryType =>
          val b = input.getBinary(1)
          Murmur3_x86_32.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            b.length, BoundBucket.Seed)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    val m = h % n
    if (m < 0) m + n else m
  }
}

object BoundBucket {
  /** Spark's `functions.hash` seed. */
  val Seed = 42

  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType => true
    case _ => false
  }
}
