package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-file sorted-position index over a positional-delete sidecar set —
  * the in-scan form of deletion-vector application (what the reference's
  * Iceberg readers do with format-v3 DVs,
  * IcebergTableWriterFactory.java:98-99): instead of anti-joining the
  * scan against `(file, pos)` pairs — a per-row string-keyed hash probe
  * that costs more than the trickle deletes it applies — each scan task
  * resolves its file's position array ONCE (the metadata file path is
  * constant per split, so the thread-local cursor hits on every row after
  * the first) and then answers membership with a primitive binary search.
  * Built driver-side from the sidecar files (bounded by
  * `read.posdel.inline-max-rows`) and shipped as ONE broadcast per
  * manifest version.
  */
final class PosDelIndex(entries: java.util.HashMap[String, Array[Long]])
    extends Serializable {

  @transient private lazy val cursor: ThreadLocal[PosDelIndex.Cursor] =
    ThreadLocal.withInitial(() => new PosDelIndex.Cursor)

  def hidden(file: UTF8String, pos: Long): Boolean = {
    val c = cursor.get()
    if (c.last == null || !c.last.equals(file)) {
      // the incoming UTF8String may point into a reused column buffer —
      // clone before caching the reference
      c.last = file.clone()
      c.positions = entries.get(file.toString)
    }
    c.positions != null && java.util.Arrays.binarySearch(c.positions, pos) >= 0
  }

  def fileCount: Int = entries.size()
}

object PosDelIndex {
  final class Cursor {
    var last: UTF8String = _
    var positions: Array[Long] = _
  }

  /** Group (file, pos) pairs into sorted primitive arrays (duplicate
    * pairs across sidecars are harmless to a binary search).
    */
  def build(pairs: Iterable[(String, Long)]): PosDelIndex = {
    val m = new java.util.HashMap[String, Array[Long]]
    pairs.groupBy(_._1).foreach { case (f, ps) =>
      m.put(f, ps.map(_._2).toArray.sorted)
    }
    new PosDelIndex(m)
  }
}

/** `hidden(file_path, row_index)` against a broadcast [[PosDelIndex]] —
  * stays inside whole-stage codegen; the per-row cost after the
  * per-split cursor warm-up is one 120-byte equals plus one primitive
  * binary search.
  */
case class PositionHidden(left: Expression, right: Expression,
                          index: Broadcast[PosDelIndex]) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(file: Any, pos: Any): Any =
    index.value.hidden(file.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxCls = classOf[PosDelIndex].getName
    val bcCls = classOf[Broadcast[_]].getName
    val bcRef = ctx.addReferenceObj("posdelBc", index, bcCls)
    val idx = ctx.addMutableState(idxCls, "posdelIdx")
    ctx.addPartitionInitializationStatement(s"$idx = ($idxCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, (f, p) => s"${ev.value} = $idx.hidden($f, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PositionHidden =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "posdel_hidden"
}
