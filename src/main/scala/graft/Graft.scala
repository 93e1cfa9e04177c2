package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.glue
import graft.functions._

/** Library session setup: registers graft's native expressions in the SQL
  * function registry so they compose in `spark.sql` text as well as the
  * Column API. */
object Graft {
  /** Add graft's optimizer rules to a live session (idempotent). The
    * cluster-deployment path is `spark.sql.extensions=graft.plans
    * .GraftExtensions`; this is the same set of rules for sessions built
    * before the library loads. */
  def enableOptimizations(spark: SparkSession): Unit = {
    Seq(graft.plans.RegexPrefixPushdown, graft.plans.SmallResultSort)
      .foreach { r =>
        val cur = spark.experimental.extraOptimizations
        if (!cur.contains(r))
          spark.experimental.extraOptimizations = cur :+ r
      }
    val strats = spark.experimental.extraStrategies
    if (!strats.exists(_.isInstanceOf[graft.plans.AsofJoinStrategy]))
      spark.experimental.extraStrategies = strats :+ new graft.plans.AsofJoinStrategy
  }

  /** Scan-split sizing for small-file local runs — called by the
    * HARNESS mains (Bench/Verify/StreamBench/tests), deliberately NOT by
    * [[enableOptimizations]]: registering optimizer rules must not
    * mutate a user session's scan configuration as a side effect (an
    * operator like `Relational.asofJoinNative` calls
    * enableOptimizations implicitly — review finding).
    *
    * Spark computes maxSplitBytes = min(maxPartitionBytes,
    * max(openCostInBytes, totalBytes / minPartitionNum)), so the
    * default 4 MB open-cost floor caps an 18 MB file at ~5 splits — a
    * CPU-heavy fused pass then runs on 5 of 32 cores (measured: t07 at
    * 3× sf1 docs, 6.8 s on ~5 splits of work that is embarrassingly
    * parallel). 256 KB keeps the floor high enough that a
    * many-small-files table still coalesces, while
    * totalBytes/defaultParallelism governs whenever one file carries
    * real data. At cluster scale files are ≥128 MB and this floor never
    * binds — it is the LOCAL sizing rule made explicit. Note split math
    * is necessary, not sufficient: parallelism is ALSO bounded by row
    * groups per file (PERF.md round-11) — corpora must be written with
    * row groups sized to the per-file core budget. */
  // NOTE: scripts/make_scale.py's layout guardrail duplicates this
  // constant (OPEN_COST=262144) and the canonical core budget (32) in
  // its split math — change them TOGETHER or corpus generation will
  // judge layouts against a stale session model (r13 review).
  def tuneLocalScanSplits(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.files.openCostInBytes", 262144L)

  def registerFunctions(spark: SparkSession): Unit = {
    glue.registerFunction(spark, "simhash64", es => SimHash64(es.head))
    glue.registerFunction(spark, "vec_dot", es => VecDotF32(es(0), es(1)))
    glue.registerFunction(spark, "shingle_words", es =>
      ShingleWords(es(0), es(1).eval().asInstanceOf[Int]))
    glue.registerFunction(spark, "tokenize_words", es => TokenizeWords(es.head))
    glue.registerFunction(spark, "lang_id", es => LangIdExpr(es.head))
  }
}
