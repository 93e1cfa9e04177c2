package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.SQLiteIO.IfExists

/** The same table-sink semantics as SQLiteIO.write (S7: existence probe +
  * IfTableExistsPolicy, SDF.swift:721-776) over a parquet directory store —
  * the representation the engine actually runs on at 100 TB, and the
  * backend for round-trip tests (≈ Tests.swift:175-198) since no live
  * SQLite driver ships in this environment.
  *
  * A "table" is `<root>/<name>`; existence = directory exists (S8, the
  * reference's sqlite_master probe, SDF.swift:43-47).
  */
final class ParquetStore(root: String) {
  private def path(table: String) = s"$root/$table"

  def exists(spark: SparkSession, table: String): Boolean =
    new java.io.File(path(table)).exists()

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  def write(df: DataFrame, table: String, ifExists: IfExists): Unit =
    df.write.mode(ifExists.saveMode).parquet(path(table))

  def drop(table: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    val f = new java.io.File(path(table))
    if (f.exists) rm(f)
  }
}
