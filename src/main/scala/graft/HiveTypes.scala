package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{struct, substring, transform}
import org.apache.spark.sql.types._

/** Hive char/varchar type plumbing shared by the engine's INSERT
  * coercion and the golden-replay fixtures.
  *
  * Hive silently TRUNCATES char/varchar on overflow
  * (serde2/typeinfo/BaseCharUtils.java enforceMaxLength); Spark's cast
  * raises EXCEED_LIMIT_LENGTH instead, so inserts pre-truncate with
  * substring before casting (the cast then pads char). */
object HiveTypes {

  /** char/varchar → string, recursively (they also hide inside
    * array/map/struct element types). */
  def stripCharVarchar(dt: DataType): DataType = dt match {
    case _: CharType | _: VarcharType => StringType
    case ArrayType(et, n) => ArrayType(stripCharVarchar(et), n)
    case MapType(k, v, n) =>
      MapType(stripCharVarchar(k), stripCharVarchar(v), n)
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = stripCharVarchar(f.dataType))))
    case other => other
  }

  /** Hive's insert cast: char/varchar truncate-then-cast (which pads
    * char), recursing into arrays and structs. */
  def cvCast(c: Column, dt: DataType): Column = dt match {
    case CharType(n) => substring(c, 1, n).cast(dt)
    case VarcharType(n) => substring(c, 1, n).cast(dt)
    // no outer cast: the rebuilt value already carries the char/
    // varchar element types, and a struct-level cast would re-pad
    // varchar fields
    case ArrayType(et, _) if stripCharVarchar(et) != et =>
      transform(c, x => cvCast(x, et))
    case st: StructType if stripCharVarchar(st) != st =>
      struct(st.fields.map(f =>
        cvCast(c.getField(f.name), f.dataType).as(f.name))
        .toIndexedSeq: _*)
    case _ => c.cast(dt)
  }
}
