package graft

import org.apache.spark.sql.SparkSession

/** Corpus-layout guardrail (r12 verdict #4): runs
  * [[graft.operators.Scale.rowGroupAudit]] against a corpus directory and
  * prints the verdict table. Exits 1 if any table is `row_group_bound` —
  * the layout that serialized the r11 sf1 corpus scan — so corpus
  * generation / CI can fail on a layout regression instead of costing a
  * session of decomposition.
  *
  *   sbt "runMain graft.AuditMain /root/repo/data_sf1"
  *
  * `skipped: nested layout` rows (hive-partitioned tables the one-level
  * audit can't see) are surfaced but don't fail the exit code — they are
  * visible omissions, not verdicts.
  */
object AuditMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AuditMain <corpus-dir> [cpus]")
    val dir = args(0)
    val cpus = if (args.length > 1) args(1)
               else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // audit under the BENCH session's split conf — the default 4 MB
    // openCost plans far fewer splits and would green-light layouts
    // that serialize in the sweeps this guardrail protects (r13 review)
    Graft.tuneLocalScanSplits(spark)
    val audit = graft.operators.Scale.rowGroupAudit(spark, dir)
    val rows = audit.collect()
    // print from the collected rows — a second action would re-read
    // every footer in the corpus
    val header = audit.schema.fieldNames
    println(header.mkString(" | "))
    rows.foreach(r => println(header.indices
      .map(i => if (r.isNullAt(i)) "null" else r.get(i).toString)
      .mkString(" | ")))
    val bound = rows.filter(_.getAs[String]("verdict") == "row_group_bound")
      .map(_.getAs[String]("table"))
    try spark.stop() catch { case _: Throwable => () }
    if (bound.nonEmpty) {
      System.err.println(s"LAYOUT REGRESSION: row_group_bound tables in " +
        s"$dir: ${bound.mkString(", ")} — rewrite with smaller row groups")
      sys.exit(1)
    }
    println(s"AUDIT OK: $dir (${rows.length} tables, core budget $cpus)")
  }
}
