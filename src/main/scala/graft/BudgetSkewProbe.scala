package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** budgetSample skew probe (r16): measures the real cost of the
  * phase-2 rate-doubling path on a HASH-ADVERSARIAL stratum — cost
  * concentrated on high-hash rows, so the low-hash presample prefix
  * covers almost nothing and the rate must double ~log₂(1/r₀) times,
  * each round one narrow corpus scan. Three cases at the same corpus:
  *
  *  - uniform: every row costs 1 — the initial margin-sized presample
  *    proves coverage in ONE scan (the spec-pinned common case);
  *  - adversarial: the top ~1% of hash space carries ~99% of the cost —
  *    coverage only proves once the rate reaches that region;
  *  - trivial: budget ≥ stratum total — the loop is skipped entirely
  *    (0 scans, the r16 fast path).
  *
  * Prints one JSON line per case with wall seconds, coverage scans
  * ([[operators.Sampling.lastCoverageRounds]]), and admitted rows.
  * PERF.md records the table; the doc sentence pricing the skew path
  * cites it.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32
  *   sbt "runMain graft.BudgetSkewProbe [reps]"
  */
object BudgetSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.Sampling

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"))
    val n = docs.count()
    // the ADVERSARY keys cost off the sampler's own hash point (seed
    // "skew" below): rows above the 0.99 hash threshold cost 100000,
    // the rest cost 1 — ~99.9% of the stratum's cost is invisible to
    // any presample below rate 0.99
    val bigCut = Sampling.hexThreshold(0.99)
    def frame(adversarial: Boolean) = docs
      .select(lit("s").as("src"), col("doc_id"),
        (if (adversarial)
           when(Sampling.hashPoint(col("doc_id"), "skew") >= lit(bigCut),
             lit(100000L)).otherwise(lit(1L))
         else lit(1L)).as("cost"))
    def run(name: String, adversarial: Boolean, budget: Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val admitted = Sampling.budgetSample(frame(adversarial), "src",
          "doc_id", "cost", budget = budget, seed = "skew").count()
        val secs = (System.nanoTime() - t0) / 1e9
        (secs, Sampling.lastCoverageRounds.get().intValue(), admitted)
      }
      val med = times.map(_._1).sorted.apply(times.size / 2)
      println(f"""{"case":"$name","budget":$budget,"n":$n,""" +
        f""""secs":$med%.3f,"scans":${times.head._2},""" +
        f""""admitted":${times.head._3},""" +
        s""""reps":[${times.map(t => f"${t._1}%.3f").mkString(",")}]}""")
    }
    // budget sized so the admitted prefix must reach INTO the high-hash
    // region (the low-hash ~99% of rows cost ~1 each)
    run("uniform", adversarial = false, budget = math.max(1L, n / 10))
    run("adversarial", adversarial = true, budget = n * 4)
    run("trivial_skip", adversarial = false, budget = Long.MaxValue / 4)
    try spark.stop() catch { case _: Throwable => () }
    System.out.flush()
  }
}
