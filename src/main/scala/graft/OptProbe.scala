package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 optimization-round measurement harness: times labelled pieces of
  * the queries under optimization (guide §1: isolate the computation with
  * the noop-equivalent `toRdd.count`, label jobs, measure before and
  * after). Usage:
  *
  *   sbt 'runMain graft.OptProbe <sfDir> <piece>[,<piece>...]'
  *
  * Pieces are registered below; each runs twice (cold, warm-ish) with the
  * bench's cleanup between runs and prints `OPTPROBE <piece> <cold> <2nd>`
  * seconds on stdout. Not part of the query surface.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val wanted = if (args.length > 1) args(1).split(",").toSeq else Seq("all")
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
    import graft.operators.{Dedup, OperatorCaches, Similarity}

    // bench-equivalent warm-up (first-compile shapes)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())

    def docs = Tables.load(spark, dir, "documents")
    def cleanup(): Unit = {
      OperatorCaches.release()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      if (wanted.contains("all") || wanted.contains(label)) {
        spark.sparkContext.setJobDescription(s"optprobe: $label")
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          f.queryExecution.toRdd.count()
          val dt = (System.nanoTime() - t0) / 1e9
          cleanup()
          dt
        }
        println(f"OPTPROBE $label ${ts.head}%.2f ${ts(1)}%.2f")
        spark.sparkContext.setJobDescription(null)
      }
    }

    run("shingle") {
      docs.select(col("doc_id"),
        graft.functions.ShingleWords.shingleHashes(col("text"), 3).as("sh"))
    }
    run("pairs_within") {
      Dedup.ngramJaccardPairsWithin(docs, "doc_id", "text", "source",
        k = 3, threshold = 0.5)
    }
    run("pairs_plain") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    }
    run("pairs_t01") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.1)
    }
    run("d10") { SparkEntry.queries("d10_dup_by_source")(spark, dir) }
    run("d07") { SparkEntry.queries("d07_dedup_components")(spark, dir) }
    run("d07_cc_only") {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.1)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      Dedup.connectedComponents(pairs, "id1", "id2")
    }
    run("s02") { SparkEntry.queries("s02_ann_ivf")(spark, dir) }
    run("s02_kmeans_only") {
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.kmeansFit(emb, k = 16, iters = 5)._2
    }
    // r18 A/B (r17 verdict #3): narrow-map argmax assignment vs the
    // max_by partial-agg shape, same fit otherwise
    run("s02_kmeans_narrow") {
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.kmeansFit(emb, k = 16, iters = 5, narrowAssign = true)._2
    }
    run("s02_kmeans_maxby") {
      val emb = Tables.load(spark, dir, "embeddings")
      Similarity.kmeansFit(emb, k = 16, iters = 5, narrowAssign = false)._2
    }
    // r18 plan artifacts the registered-query dumps can't show (both run
    // at plan-build time inside their operators): the kmeans assignment
    // step's plan per variant, and d07's pre-checkpoint edge-build plan.
    if (wanted.contains("r18_plans")) {
      def dumpPlan(path: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val p = java.nio.file.Paths.get(path)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
          java.nio.file.StandardOpenOption.WRITE)
        System.err.println(s"[optprobe] plan -> $path")
      }
      val emb = Tables.load(spark, dir, "embeddings")
      dumpPlan("plans/r18/s02_kmeans_assign_before.txt",
        Similarity.kmeansFit(emb, k = 16, iters = 0, narrowAssign = false)._2)
      cleanup()
      dumpPlan("plans/r18/s02_kmeans_assign_after.txt",
        Similarity.kmeansFit(emb, k = 16, iters = 0, narrowAssign = true)._2)
      cleanup()
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.1)
      val raw = {
        val f = pairs.select(col("id1").as("src"), col("id2").as("dst"))
        f.union(f.select(col("dst").as("src"), col("src").as("dst")))
          .localCheckpoint()
      }
      val w = Dedup.edgeWidth(raw.count(), 32)
      dumpPlan(s"plans/r18/d07_edge_build_width${w}_after.txt",
        Dedup.edgeBuild(raw, w))
      cleanup()
    }

    // r18 (r17 verdict #6): validate d10's Within operator one decade up
    // — same-source pair generation (restriction in the candidate join
    // key) vs the r16 shape (all pairs, then source-tag joins + filter),
    // with ShuffleMeter record counts. Both produce the same-source pair
    // set; the claim under test is candidate volume dropped BEFORE the
    // exchanges (guide §2.3) and the (shingle, source) key's skew split.
    if (wanted.contains("within_shuffle")) {
      def meter(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
        spark.sparkContext.setJobDescription(s"optprobe: within $label")
        val t0 = System.nanoTime()
        val recs = ShuffleMeter.recordsDuring(spark.sparkContext) {
          f.queryExecution.toRdd.count(); ()
        }
        println(f"WITHIN_SHUFFLE $label recs=$recs sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        cleanup()
      }
      (1 to 2).foreach { i =>
        meter(s"plain_filtered$i") {
          val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
            k = 3, threshold = 0.5)
          val s1 = docs.select(col("doc_id").as("id1"), col("source").as("s1"))
          val s2 = docs.select(col("doc_id").as("id2"), col("source").as("s2"))
          p.join(broadcast(s1), "id1").join(broadcast(s2), "id2")
            .filter(col("s1") === col("s2"))
            .select(col("id1"), col("id2"), col("s1").as("source"))
        }
        meter(s"within$i") {
          Dedup.ngramJaccardPairsWithin(docs, "doc_id", "text", "source",
            k = 3, threshold = 0.5)
        }
      }
    }

    // r18 A/B (r17 verdict #5): the size-gated narrow final sort
    // (plans.SmallResultSort) over a battery of small-result queries —
    // the per-query harness floor's range-sampling job + wide reduce
    // wave vs the single-partition route. Alternating off/on rounds so
    // box drift hits both arms.
    if (wanted.contains("smallsort_ab")) {
      val battery = Seq("q04_having", "q16_sort_multi", "q21_distinct",
        "q26_date_parts", "q64_nulls_order", "q65_int_div",
        "q46_null_funcs", "q69_minmax_null", "t02_quality", "q13_window_rank")
      def once(label: String): Unit = {
        spark.sparkContext.setJobDescription(s"optprobe: smallsort $label")
        val t0 = System.nanoTime()
        battery.foreach { n =>
          SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
        }
        println(f"SMALLSORT $label ${(System.nanoTime() - t0) / 1e9}%.2f")
        cleanup()
      }
      once("warm")
      (1 to 3).foreach { i =>
        spark.conf.set(graft.plans.SmallResultSort.confKey, "0")
        once(s"off$i")
        spark.conf.unset(graft.plans.SmallResultSort.confKey)
        once(s"on$i")
      }
    }

    run("q33") { SparkEntry.queries("q33_window_range")(spark, dir) }
    run("q45") { SparkEntry.queries("q45_salted_join")(spark, dir) }
    run("q03") { SparkEntry.queries("q03_distinct_agg")(spark, dir) }
    run("q86") { SparkEntry.queries("q86_table_profile")(spark, dir) }
    run("c01") { SparkEntry.queries("c01_date_tri")(spark, dir) }
    run("d02") { SparkEntry.queries("d02_dedup_minhash")(spark, dir) }
    run("d06") { SparkEntry.queries("d06_cosine_lsh")(spark, dir) }
    run("d09") { SparkEntry.queries("d09_dedup_incremental")(spark, dir) }
    run("d11") { SparkEntry.queries("d11_lsh_incremental")(spark, dir) }

    try spark.stop() catch { case _: Throwable => () }
  }
}
