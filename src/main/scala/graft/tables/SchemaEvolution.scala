package graft.tables

import org.apache.spark.sql.types._

/** D6 — union-by-name schema evolution with Iceberg's safe promotions
  * (int→long, float→double), mirroring `unionByNameWith` as used in
  * SINK/tableoperator/IcebergTableOperator.java:136-151 and the evolution
  * doc docs/iceberg.md:276-297. Commit-only-on-change is the caller's guard.
  */
object SchemaEvolution {

  def union(current: StructType, incoming: StructType): StructType = {
    val have = current.fieldNames.toSet
    val updated = current.fields.map { f =>
      incoming.fields.find(_.name == f.name) match {
        case Some(in) => f.copy(dataType = promote(f.dataType, in.dataType))
        case None     => f
      }
    }
    val added = incoming.fields.filterNot(f => have.contains(f.name))
      .map(_.copy(nullable = true)) // late-added columns must be optional
    StructType(updated ++ added)
  }

  def promote(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y                     => a
    case (IntegerType, LongType)              => LongType
    case (LongType, IntegerType)              => LongType
    case (FloatType, DoubleType)              => DoubleType
    case (DoubleType, FloatType)              => DoubleType
    case (sa: StructType, sb: StructType)     => union(sa, sb)
    case (ArrayType(ea, n), ArrayType(eb, _)) => ArrayType(promote(ea, eb), n)
    case (MapType(ka, va, n), MapType(kb, vb, _)) =>
      MapType(promote(ka, kb), promote(va, vb), n)
    case _ => a // incompatible change: existing type wins (reference warns)
  }

  def changed(current: StructType, merged: StructType): Boolean =
    current != merged
}
