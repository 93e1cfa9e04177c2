package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF recall probe (r15): measures, on a real corpus, the recall@k of
  * the fitted-cell IVF path against exact brute force across an nprobe
  * grid — the calibration instrument behind
  * [[operators.Similarity.ivfParamsFor]]'s coverage model
  * recall(f) ≥ 1 − (1−f)^α, f = nprobe/nCells. For each grid point it
  * prints measured recall and the IMPLIED α = ln(1−recall)/ln(1−f)
  * (+∞ when recall is exactly 1 — reported as null); the sizer ships a
  * default α far under the worst measured value so the model
  * under-promises (PERF.md r15 records the calibration table).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.IvfProbe
  *   [k] [nQueries] [fitIters]"
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = args.headOption.map(_.toInt).getOrElse(5)
    val nq = args.drop(1).headOption.map(_.toInt).getOrElse(50)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    // queries spread across the id range (ids are shard-ordered in the
    // generated corpora — consecutive ids cluster, a prefix would probe
    // one region only)
    val step = math.max(1L, n / nq)
    val queries = emb.filter(pmod(col("vec_id"), lit(step)) === 0)
      .limit(nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .cache()
    val nQueries = queries.count()
    val nCells = math.ceil(math.sqrt(n.toDouble)).toInt
    val (cents, _) = Similarity.kmeansFit(emb, nCells, iters)
    val centFrame = {
      import spark.implicits._
      cents.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell_id", "cell_vec")
    }
    val brute = Similarity.bruteForceTopK(emb, queries, k)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nBrute = brute.count()
    // fixed small-nprobe points plus fraction-anchored ones: the sizer
    // operates in the high-f tail (f ≈ 0.78 at floor 0.95, α = 2), so
    // the calibration must measure THERE, not extrapolate from small f
    val grid = (Seq(1, 2, 3, 4, 6, 8, 12, 16, 24, 32) ++
        Seq(0.4, 0.55, 0.7, 0.776, 0.85).map(f => math.ceil(f * nCells).toInt))
      .filter(p => p >= 1 && p <= nCells).distinct.sorted
    val rows = grid.map { nprobe =>
      val ivf = Similarity.ivfTopKWithCells(emb, queries, centFrame, k, nprobe)
      val hit = ivf.join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
      val recall = hit.toDouble / nBrute
      val f = nprobe.toDouble / nCells
      val alpha =
        if (recall >= 1.0 || f >= 1.0) "null"
        else f"${math.log1p(-recall) / math.log1p(-f)}%.2f"
      f"""{"nprobe":$nprobe,"f":$f%.4f,"recall":$recall%.4f,"implied_alpha":$alpha}"""
    }
    try spark.stop() catch { case _: Throwable => () }
    println(s"""{"n":$n,"k":$k,"n_queries":$nQueries,"n_cells":$nCells,""" +
      s""""fit_iters":$iters,"brute_rows":$nBrute,""" +
      s""""grid":[${rows.mkString(",")}]}""")
    System.out.flush()
  }
}
