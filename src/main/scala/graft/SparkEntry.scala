package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Core, Core2, Core3, Core4, Core5, Core6, Pipeline, QueryDef, SQLiteSemantics}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All query registries, concatenated. Each QueryDef carries its Spark
    * implementation and (when SQL-expressible) its DuckDB oracle. */
  private def allDefs: Seq[QueryDef] =
    Core.defs ++ Core2.defs ++ Core3.defs ++ Core4.defs ++ Core5.defs ++
      Core6.defs ++ SQLiteSemantics.defs ++ Pipeline.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql.trim }.toMap
}
