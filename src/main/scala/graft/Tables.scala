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

  /** Sessions must set spark.sql.legacy.parquet.nanosAsLong=true: the
    * events table carries TIMESTAMP(NANOS), which vanilla Spark rejects.
    * With the flag it arrives as LongType nanos; we normalize to a real
    * TimestampType (µs) here with exact integer division (`div`, not `/`,
    * which would round-trip through double and lose µs precision on
    * 1.7e18-scale nano values). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        acc.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      else acc
    }
  }

  /** Register every table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle text 1:1 when that is the clearest expression. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
