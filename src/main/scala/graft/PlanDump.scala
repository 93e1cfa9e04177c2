package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.SparkSession

/** Harness tooling (not part of the query surface): dumps
  * `.explain("formatted")` for a comma-separated list of registered
  * queries into an output directory, one `<name>_<tag>.txt` per query.
  *
  *   sbt 'runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...|all>'
  *
  * The optimization rounds commit these files under plans/r<N>/ so the
  * judge can check plan claims (Exchange count, join strategy,
  * PushedFilters/ReadSchema) without running Spark. Uses the same
  * session config as Bench so the captured plan is the benched plan
  * (AQE initial plan: `isFinalPlan=false` — the committed artifact
  * records the static shape; runtime AQE decisions are quoted in
  * OPTIMIZATION notes where they matter).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val wanted = args(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.enableOptimizations(spark)
    Graft.tuneLocalScanSplits(spark)
    // r18: A/B override for the size-gated narrow final sort (0 = off),
    // so the before/after floor plans can both be dumped
    sys.env.get("SPARK_GRAFT_SMALLSORT").foreach(v =>
      spark.conf.set(graft.plans.SmallResultSort.confKey, v))
    Files.createDirectories(Paths.get(outDir))
    val names: Seq[String] =
      if (wanted == "all") SparkEntry.queries.keys.toSeq.sorted
      else wanted.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query: $n"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        plan.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
      System.err.println(s"[plandump] $n -> $outDir/${n}_$tag.txt")
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
