package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SQLiteExprs

/** The reference's user-extension surface: the codec protocol pair
  * `SQLiteEncodable`/`SQLiteDecodable`/`SQLiteCodable`
  * (SDF.swift:134-158, dispatch :444-449 read / :593-650 write).
  *
  * A codec maps between a *storage cell* column (what sits in the SQLite
  * table / parquet file) and a *logical* column. Instead of per-row
  * closure dispatch (the reference calls `init?(statement:columnIndex:)`
  * per cell), a Spark codec is a pair of Column→Column transforms, so the
  * whole decode stays inside Catalyst and whole-stage codegen.
  *
  * Reference quirk preserved: decode runs BEFORE the NULL check
  * (SDF.swift:444-449), so a codec may map NULL cells to values — hence
  * `decode` receives the raw, possibly-null cell and may coalesce.
  */
trait SQLiteCodec[T] {
  /** storage cell → logical value */
  def decode(cell: Column): Column
  /** logical value → storage cell */
  def encode(value: Column): Column
  /** declared SQLite type for CREATE TABLE (None = bare/any affinity,
    * the reference's fallback for unknown types, SDF.swift:761-767) */
  def storageDecl: Option[String]
}

object SQLiteCodec {
  /** Bool stored as INT (C1, SDF.swift:455-456). */
  implicit val boolCodec: SQLiteCodec[Boolean] = new SQLiteCodec[Boolean] {
    def decode(cell: Column) = SQLiteExprs.boolFromInt(cell.cast(LongType))
    def encode(value: Column) = when(value, 1L).otherwise(0L)
    def storageDecl = Some("BOOLEAN")
  }

  /** Timestamp stored as TEXT "yyyy-MM-dd HH:mm:ss" on write, decoded from
    * any of SQLite's three date representations on read (C4/C6). */
  implicit val timestampCodec: SQLiteCodec[java.sql.Timestamp] =
    new SQLiteCodec[java.sql.Timestamp] {
      def decode(cell: Column) = SQLiteExprs.dateTriFromString(cell.cast(StringType))
      def encode(value: Column) = SQLiteExprs.dateToText(value)
      def storageDecl = Some("DATE")
    }

  /** Unsigned 64-bit stored as INT when it fits, TEXT above Int64.max
    * (C3, SDF.swift:473-479/617-623); logical type Decimal(20,0). */
  implicit val uint64Codec: SQLiteCodec[BigDecimal] = new SQLiteCodec[BigDecimal] {
    def decode(cell: Column) = SQLiteExprs.uint64FromText(cell.cast(StringType))
    def encode(value: Column) = value.cast(StringType)
    def storageDecl = Some("INT")
  }

  /** Everything-else fallback (C6 tail, SDF.swift:642-647): encode via the
    * value's string rendering; decode is identity-as-string. */
  def descriptionFallback: SQLiteCodec[String] = new SQLiteCodec[String] {
    def decode(cell: Column) = cell.cast(StringType)
    def encode(value: Column) = value.cast(StringType)
    def storageDecl = None
  }

  def apply[T](implicit c: SQLiteCodec[T]): SQLiteCodec[T] = c
}
