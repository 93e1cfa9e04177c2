package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (TESTDATA.md).
  *
  * Every query entry point receives `(spark, sfDir)`; tables are one
  * parquet file per name under that dir. At 100 TB these would be
  * multi-file partitioned datasets — `spark.read.parquet(dir)` handles
  * both shapes transparently, so nothing here assumes single-file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema-adaptive read: the events table has shipped with three
    * different physical `ts` encodings over the corpus's lifetime —
    * TIMESTAMP(NANOS) (arrives as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong=true), TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ — what DuckDB and
    * pyarrow write by default), and plain UTC TIMESTAMP. Mirroring the
    * reference's runtime-typed cell decode (SQLiteDataFrame.swift:87-104
    * reads each cell by its *actual* storage class, never a declared one),
    * we branch on the type the file actually carries and normalize all
    * three to TimestampType. Sessions pin the TZ to UTC, so the NTZ cast
    * is exact; the nano path uses integer `div` (not `/`, which would
    * round-trip through double and lose µs precision at 1.7e18 scale). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalize a `ts` column to TimestampType whatever physical type it
    * arrived as; no-op when absent or already a timestamp. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => // legacy TIMESTAMP(NANOS) as raw nano-longs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) => // µs NTZ; session TZ is UTC → exact
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle text 1:1 when that is the clearest expression. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
