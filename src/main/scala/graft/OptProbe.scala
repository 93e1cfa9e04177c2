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
