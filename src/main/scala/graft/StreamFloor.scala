package graft

import org.apache.spark.sql.SparkSession

/** Per-query streaming-floor decomposition (r12 verdict #5): runs each
  * e-block query end-to-end and splits its wall time into the engine's
  * own StreamingQueryProgress components, so PERF.md can publish a floor
  * budget per query — what is attackable (trigger count, state commits)
  * vs irreducible (semantic watermark-advance emission, planning).
  *
  * One JSON line per query:
  *   {"query":"e04_...","wall_sec":...,"triggers":N,
  *    "addBatch_ms":..,"getBatch_ms":..,"latestOffset_ms":..,
  *    "queryPlanning_ms":..,"walCommit_ms":..,"commitOffsets_ms":..,
  *    "triggerExecution_ms":..,"stateCommit_ms":..,"stateRows":..,
  *    "outside_engine_sec":..}
  *
  * `outside_engine_sec` = wall − Σ triggerExecution — the setup cost the
  * progress log can't see (source listing, sink/query start, stop, the
  * downstream batch aggregation over the materialized result). Each
  * query runs `reps` times; the MINIMUM wall run is reported (the first
  * run pays whole-stage codegen + state-store provider init, which an
  * always-on stream amortizes to zero).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamFloor [reps]"
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // r13 ADVICE: recentProgress retains only this many entries
      // (default 100) — a >100-trigger run would silently undercount the
      // triggerExecution/addBatch sums and inflate outside_engine_sec.
      // Raise far past any e-block trigger count, and emit the retained
      // count per query so truncation would be visible where it matters.
      .config("spark.sql.streaming.numRecentProgressUpdates", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.enableOptimizations(spark)
    Graft.tuneLocalScanSplits(spark)
    // SPARK_GRAFT_ONLY narrows the set (same contract as Bench) — a
    // decade-scale decomposition of ONE query should not pay for the
    // whole block
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val eQueries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("e"))
      .filter(q => only.forall(_.contains(q._1)))
    // a selection that matches nothing must be VISIBLE (Bench's
    // n_queries=0 lesson): silence here reads as "measured clean"
    if (eQueries.isEmpty)
      println(s"""{"error":"SPARK_GRAFT_ONLY matched no e-queries: ${
        only.map(_.mkString(",")).getOrElse("")}"}""")
    def ms(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    eQueries.foreach { case (name, fn) =>
      val runs = (1 to reps).map { _ =>
        // reset before each run: a query that never routes through
        // runToMemory (batch-shaped e02; e07's foreachBatch sink) must
        // report "no stream progress", not the previous query's numbers
        graft.streaming.EventStreams.lastRunProgress = Nil
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, graft.streaming.EventStreams.lastRunProgress)
      }
      val (wall, prog) = runs.minBy(_._1)
      if (prog.isEmpty) {
        println(s"""{"query":"$name","wall_sec":${ms(wall)},"triggers":0,"note":"no runToMemory progress (batch query or external sink) — no floor decomposition"}""")
        System.out.flush()
      } else {
      val keys = Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
        "walCommit", "commitOffsets", "triggerExecution")
      val sums = keys.map { k =>
        k -> prog.map(p => Option(p.durationMs.get(k)).map(_.toLong)
          .getOrElse(0L)).sum
      }.toMap
      val stateCommit = prog.flatMap(_.stateOperators.toSeq)
        .map(_.commitTimeMs).sum
      val stateRows = prog.flatMap(_.stateOperators.toSeq)
        .map(_.numRowsTotal).maxOption.getOrElse(0L)
      val outside = wall - sums("triggerExecution") / 1000.0
      // retained-vs-true trigger visibility: recentProgress is a bounded
      // buffer; if last_batch_id+1 > triggers the buffer truncated and
      // the _ms sums above undercount (can't happen under the 10000-cap
      // conf for these queries, but the reader shouldn't have to trust
      // that)
      val lastBatch = prog.map(_.batchId).max
      println(s"""{"query":"$name","wall_sec":${ms(wall)},"triggers":${
        prog.size},"last_batch_id":$lastBatch,${
        keys.map(k => s""""${k}_ms":${sums(k)}""").mkString(",")
        },"stateCommit_ms":$stateCommit,"stateRows":$stateRows,"outside_engine_sec":${
        ms(outside)}}""")
      System.out.flush()
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    try spark.stop() catch { case _: Throwable => () }
  }
}
