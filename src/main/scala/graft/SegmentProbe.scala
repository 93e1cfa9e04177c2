package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Segment-accumulation probe (r16): measures the one IngestIndex claim
  * the batch/corpus tables cannot see — the SEGMENT dimension. Every
  * ingest appends a persisted segment, and every probe reads all of
  * them, so per-ingest cost drifts up with segment count (more cached
  * union branches = more narrow-scan tasks per probe, even though
  * shuffle stays batch-proportional); `compact*` folds the segments
  * back into one at a corpus-sized price. This probe runs a CHAIN of
  * equal-sized ingests against one carried MinHash index and records
  * each step's wall seconds + shuffle records as segments grow, then
  * times a compaction and one post-compact ingest — the sawtooth whose
  * two slopes (per-segment tax, compaction price) give the amortized
  * maintenance schedule the docs prescribe ("compact on the caller's
  * schedule, nightly"). With SPARK_GRAFT_COMPACT_EVERY=k the chain
  * compacts every k ingests and the sawtooth is measured directly.
  *
  * Per-step reps: the measured reps probe WITHOUT advancing (ingest
  * returns a new index and never mutates its input), scoped so their
  * caches drop; the LAST rep advances the chain and its segment caches
  * join the EPOCH scope, which is released as soon as a materialized
  * compaction supersedes it — the production cache-lifetime pattern, so
  * the probe measures the segment tax, not block-manager accumulation.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32
  *   [SPARK_GRAFT_SEGMENTS=24] [SPARK_GRAFT_COMPACT_EVERY=0]
  *   sbt "runMain graft.SegmentProbe [reps]"
  * One JSON line per event (build / ingest / compact); PERF.md records
  * the curves.
  */
object SegmentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_REPS").map(_.toInt)).getOrElse(3)
    val nSteps = sys.env.getOrElse("SPARK_GRAFT_SEGMENTS", "24").toInt
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "0").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{IngestIndex, OperatorCaches}

    val meter = new ShuffleMeter(spark.sparkContext)
    def quiesce(): Long = meter.quiesce()
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def emit(event: String, step: Int, segments: Int, times: Seq[Double],
        shuffled: Long, pairs: Long): Unit =
      println(f"""{"probe":"segment","event":"$event","step":$step,""" +
        f""""segments":$segments,"secs":${median(times)}%.3f,""" +
        s""""reps":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""shuffle_records":$shuffled,"pairs":$pairs}""")

    // 50/50 protocol: half the corpus is the build, the other half is
    // split into nSteps equal id-range batches so every step ingests
    // the same row count — any per-step drift is the segment tax, not
    // batch-size variance
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val cut = nDocs / 2
    val perBatch = math.max(1L, (nDocs - cut) / nSteps)
    def batch(i: Int) = { // i is 1-based
      val lo = cut + (i - 1) * perBatch
      val hi = if (i == nSteps) nDocs else lo + perBatch
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    }

    // Epoch structure mirrors the documented production pattern:
    // compaction SUPERSEDES the pre-compact segment caches, so a real
    // pipeline releases them once the compacted frames are materialized
    // — a probe that kept every superseded cache alive would measure
    // block-manager accumulation, not the segment tax. Each epoch's
    // ingests run inside one scope; compact runs in its own scope; after
    // a compact materializes, the old base + epoch scopes are released.
    var before = 0L
    var t0 = 0L
    val (bIdx, bScope) = OperatorCaches.scoped {
      before = quiesce()
      t0 = System.nanoTime()
      val i = IngestIndex.buildMinHash(docs.filter(col("doc_id") < cut),
        "doc_id", "text")
      i.buckets.count(); i.docs.count()
      i
    }
    emit("build", 0, bIdx.segments, Seq((System.nanoTime() - t0) / 1e9),
      quiesce() - before, -1)
    var idx = bIdx
    // scopes holding the frames the current index rests on — released
    // together once a materialized compact supersedes them
    var baseScopes: List[graft.operators.CacheScope] = List(bScope)

    def compactNow(step: Int): Unit = {
      val (cIdx, cScope) = OperatorCaches.scoped {
        before = quiesce()
        t0 = System.nanoTime()
        val c = IngestIndex.compactMinHash(idx)
        c.buckets.count(); c.docs.count()
        c
      }
      emit("compact", step, cIdx.segments,
        Seq((System.nanoTime() - t0) / 1e9), quiesce() - before, -1)
      baseScopes.foreach(_.release()) // superseded by the compact
      baseScopes = List(cScope)
      idx = cIdx
    }

    def runEpoch(steps: Range, label: String = "ingest"): Unit = {
      val (eIdx, eScope) = OperatorCaches.scoped {
        for (i <- steps) {
          val b = batch(i)
          // throwaway measured reps: same work, caches scoped + dropped
          val probeTimes = (1 until reps).map { _ =>
            val (secs, scope) = OperatorCaches.scoped {
              before = quiesce()
              t0 = System.nanoTime()
              val (p, _) = IngestIndex.ingestMinHash(idx, b, "text", 0.8)
              p.count()
              (System.nanoTime() - t0) / 1e9
            }
            scope.release()
            secs
          }
          // advancing rep: its segment caches stay in the epoch scope
          before = quiesce()
          t0 = System.nanoTime()
          val (p, next) = IngestIndex.ingestMinHash(idx, b, "text", 0.8)
          val pairs = p.count()
          val advSecs = (System.nanoTime() - t0) / 1e9
          val shuffled = quiesce() - before
          idx = next
          emit(label, i, idx.segments, probeTimes :+ advSecs, shuffled,
            pairs)
        }
        idx
      }
      // the epoch's segments are now part of the index base: released
      // together with the rest at the next compact
      baseScopes ::= eScope
      idx = eIdx
    }

    val every = if (compactEvery > 0) compactEvery else nSteps
    var start = 1
    while (start <= nSteps) {
      val end = math.min(start + every - 1, nSteps)
      runEpoch(start to end)
      // "every k" includes a final full epoch (a trailing PARTIAL epoch
      // stays uncompacted); the never-compact config compacts once at
      // the end so the run prices both slopes
      if (compactEvery == 0 ||
          (compactEvery > 0 && end % compactEvery == 0)) compactNow(end)
      start = end + 1
    }
    if (compactEvery == 0) {
      // one post-compact re-ingest of the last batch (idempotent by the
      // re-delivery contract): the step-1-shaped probe cost the
      // compaction buys back
      runEpoch(nSteps to nSteps, label = "ingest_post_compact")
    }
    baseScopes.foreach(_.release())

    try spark.stop() catch { case _: Throwable => () }
    println(s"""{"probe":"segment_summary","sf_dir":"$sfDir","reps":$reps,""" +
      s""""cpus":"$cpus","n_docs":$nDocs,"steps":$nSteps,""" +
      s""""compact_every":$compactEvery}""")
    System.out.flush()
  }
}
