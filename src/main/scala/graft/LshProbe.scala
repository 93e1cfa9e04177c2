package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LSH bucket-occupancy probe (r14): prints, as one JSON line, the
  * bucket distribution and candidate-pair volume the auto-sized
  * hyperplane banding would generate on a corpus — BEFORE paying for
  * the pairs. The uniform-bucket cost model (candidates ≈
  * bands·n·occupancy/2) assumes hyperplanes split the data evenly;
  * real embedding corpora are anisotropic (clustered, non-centered), so
  * the tail of the occupancy distribution is where the actual cost
  * lives — sum over buckets of C(occ, 2) is the ground truth the model
  * approximates. Run this before a large dedup job to see whether the
  * (threshold, floor, maxBucket) point is affordable.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.LshProbe
  *   [threshold] [recallFloor] [maxBands] [--time] [--recall]"
  * `maxBands` (default: the sizer's 4096 = effectively unbudgeted)
  * probes a BUDGETED configuration — e.g. 64 reproduces the benched
  * d06 sizing. With --time it then RUNS the auto-sized banded dedup
  * once (the operator's self-sized shuffle width, no manual conf) and
  * appends wall_sec + found pairs to the JSON line.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // positional numerics are each optional; --flags may appear anywhere
    val nums = args.filterNot(_.startsWith("--"))
    val threshold = nums.headOption.map(_.toDouble).getOrElse(0.4)
    val floor = nums.drop(1).headOption.map(_.toDouble).getOrElse(0.95)
    val maxBands = nums.drop(2).headOption.map(_.toInt).getOrElse(4096)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val p = operators.Dedup.hyperplaneLshParamsFor(n, threshold, floor,
      maxBands = maxBands)
    val ex = emb.select(col("vec_id"),
        functions.HyperplaneSig.bandBuckets(col("embedding"), 64,
          p.bands, p.rowsPerBand, 7L).as("hbb"))
      .select(posexplode(col("hbb")).as(Seq("band", "bucket")))
    val occ = ex.groupBy("band", "bucket").agg(count(lit(1)).as("occ"))
    val row = occ.agg(
      count(lit(1)).as("n_buckets"),
      max(col("occ")).as("max_occ"),
      expr("percentile_approx(occ, 0.5)").as("p50_occ"),
      expr("percentile_approx(occ, 0.99)").as("p99_occ"),
      sum(col("occ") * (col("occ") - 1) / 2).as("cand_pairs"),
      sum(when(col("occ") > 1000, col("occ") * (col("occ") - 1) / 2)
        .otherwise(0L)).as("cand_pairs_hot1k")).collect()(0)
    // the exact model the operator sizes its shuffle width with
    val uniform = p.expectedCandidates
    // --time / --recall share ONE execution of the banded dedup (and
    // one "found_pairs" field — the flags compose; r15 review pass).
    // --recall (r15): measure the auto-sized banding's recall against
    // the O(n²) EXACT pair set at this scale — the r14 verdict's ask
    // that the recall gates' n=500 measurement be repeated one decade
    // up, where the sizer actually wants hundreds of bands. Exact side
    // is cosineNearDupPairs (the d05 reference recompute); fp must be
    // 0 by construction (every emission is exact-verified).
    val wantTime = args.contains("--time")
    val wantRecall = args.contains("--recall")
    val extras =
      if (!wantTime && !wantRecall) ""
      else {
        val found0 = operators.Dedup.cosineNearDupLSHBanded(
            emb, "vec_id", "embedding", threshold, 64, p)
          .select(col("id1"), col("id2"))
        val found = if (wantRecall)
          found0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else found0
        val t0 = System.nanoTime()
        val nFound = found.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val timePart = if (wantTime) f""","wall_sec":$dt%.3f""" else ""
        val recallPart =
          if (!wantRecall) ""
          else {
            val exact = operators.Dedup.cosineNearDupPairs(
                emb, "vec_id", "embedding", threshold)
              .select(col("id1"), col("id2"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val ne = exact.count()
            val hit = found.join(exact, Seq("id1", "id2"), "left_semi").count()
            val r = if (ne == 0) -1.0 else hit.toDouble / ne
            f""","exact_pairs":$ne,"false_positives":${nFound - hit},""" +
              f""""measured_recall":$r%.4f,"predicted_recall":${p.predictedRecall}%.4f"""
          }
        s"""$timePart,"found_pairs":$nFound$recallPart"""
      }
    try spark.stop() catch { case _: Throwable => () }
    println(s"""{"n":$n,"threshold":$threshold,"floor":$floor,""" +
      s""""bands":${p.bands},"rowsPerBand":${p.rowsPerBand},""" +
      s""""clamped":${p.clamped},"n_buckets":${row.getLong(0)},""" +
      s""""max_occ":${row.getLong(1)},"p50_occ":${row.get(2)},""" +
      s""""p99_occ":${row.get(3)},"cand_pairs":${row.get(4)},""" +
      s""""cand_pairs_hot1k":${row.get(5)},""" +
      s""""uniform_model_pairs":${uniform.toLong}$extras}""")
    System.out.flush()
  }
}
