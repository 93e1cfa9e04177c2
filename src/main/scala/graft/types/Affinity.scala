package graft.types

import org.apache.spark.sql.types._

/** SQLite declared-type → column type inference ("type affinity").
  *
  * Mirrors the reference's modified affinity rules
  * (SQLiteDataFrame.swift:161-194, README.md:62-74): case-insensitive
  * substring match on the declared type, in rule order, with the
  * nonstandard BOOL/DATE extensions, falling back to `.any` when nothing
  * matches or there is no declared type (e.g. computed SELECT expressions).
  *
  * Pure function — unit/property tested without any live SQLite.
  */
sealed abstract class SQLiteType(val sparkType: DataType)
object SQLiteType {
  /** 64-bit integer (SQLite ints are always i64, SDF.swift:79). */
  case object Int   extends SQLiteType(LongType)
  case object Text  extends SQLiteType(StringType)
  case object Blob  extends SQLiteType(BinaryType)
  case object Float extends SQLiteType(DoubleType)
  case object Bool  extends SQLiteType(BooleanType)
  case object Date  extends SQLiteType(TimestampType)
  /** No affinity: per-cell dynamic typing. Spark has a fixed schema, so we
    * surface `.any` as StringType (documented cast, SURVEY.md §7.3 C5). */
  case object Any   extends SQLiteType(StringType)

  /** Rule order matters (SDF.swift:171-179): INT before the REAL family,
    * etc. — `POINT` must land on Int (contains "INT"), matching SQLite. */
  def fromDeclared(declared: String): SQLiteType = {
    val t = declared.toUpperCase
    if (t.contains("INT")) Int
    else if (t.contains("CHAR") || t.contains("CLOB") || t.contains("TEXT")) Text
    else if (t.contains("BLOB")) Blob
    else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB")) Float
    else if (t.contains("BOOL")) Bool
    else if (t.contains("DATE")) Date
    else Any
  }

  /** Column-type precedence (SDF.swift:364-374):
    * user override → declared-type affinity → `.any`. */
  def resolve(
      name: String,
      declared: Option[String],
      overrides: Map[String, SQLiteType]): SQLiteType =
    overrides.getOrElse(name, declared.map(fromDeclared).getOrElse(Any))

  /** Write-side mapping: Spark type → SQLite column decl
    * (SDF.swift:741-771). Unknown types get NO declared type (bare column
    * name = "any" affinity, SDF.swift:761-767); we return None for those. */
  def declFor(dt: DataType): Option[String] = dt match {
    case StringType                          => Some("TEXT")
    case BooleanType                         => Some("BOOLEAN")
    case ByteType | ShortType | IntegerType | LongType => Some("INT")
    case FloatType                           => Some("FLOAT")
    case DoubleType                          => Some("DOUBLE")
    case TimestampType | DateType            => Some("DATE")
    case BinaryType                          => Some("BLOB")
    case d: DecimalType if d.scale == 0      => Some("INT") // UInt64 escape hatch
    case _                                   => None
  }
}
