package graft
import org.apache.spark.sql.SparkSession

/** The control-drift defense's pure decision math, extracted so the
  * suite pins the constants the r13 chaos runs calibrated (chaos
  * finding #3: the old min+0.2 absolute floor was sized for a ~60 ms
  * control but this box's control runs 0.07–0.11 s, so a 77 s rep of a
  * 14 s-warm query recorded into a "clean" sweep, and 24 hogs inflating
  * queries +20% cleared a min+0.1 bar). Bench.main supplies the running
  * control state; these decide. */
object BenchDefense {
  /** Per-rep drift bar over the running unloaded minimum: 1.5×min with
    * a +0.05 s absolute floor — makes the ratio binding for this
    * control class (0.07–0.11 s idle). */
  def driftBar(controlMin: Double): Double =
    math.max(1.5 * controlMin, controlMin + 0.05)

  /** Median-of-3 confirmation for a suspicious first sample: a single
    * scheduler blip (idle tail reaches ~0.21 s) costs 0.2 s of extra
    * sampling, not a rerun; sustained load reads high across all
    * three. */
  def confirmed(c1: Double, c2: Double, c3: Double, bar: Double): Boolean =
    Vector(c1, c2, c3).sorted.apply(1) > bar

  /** Baseline-was-loaded test — a slightly wider bar than per-rep (the
    * base is a median of 5 with no confirmation retry, and controlMin
    * converges DOWN over a long sweep). Calibrated against observed
    * data: idle bases 0.089–0.134 stay clean, chaos fullload bases
    * 0.155/0.222 flag (min ~0.072). */
  def baselineLoaded(controlBase: Double, controlMin: Double): Boolean =
    controlBase > math.max(1.75 * controlMin, controlMin + 0.08)
}

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line as the process's LAST stdout line (build.sbt
  * sets `run / outputStrategy := StdoutOutput` and `showSuccess := false`
  * so sbt neither prefixes "[info] " nor appends a success trailer).
  * The driver captures only the last ~2000 chars of output, so the line
  * must both END and START inside that window: we round to milliseconds
  * and, if needed, trim the per-query map to the slowest entries until the
  * whole line fits a conservative budget (flagged via "omitted").
  * Queries that throw are reported with value -1 and listed in "errors".
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Partition-count override for scale experiments (r14): shuffle
    // partitions must track the largest INTERMEDIATE volume, not the
    // corpus — d06's recall-first tier at sf3 generates 582M candidate
    // pairs, and at partitions=32 that is 18M rows/task, which
    // sort-spilled the box's disk to death. The canonical bench config
    // stays partitions=cpus (comparable round-over-round); a decade run
    // that needs wider shuffles sets this explicitly and the config
    // travels in the JSON via "cpus"/"partitions".
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.enableOptimizations(spark)
    Graft.tuneLocalScanSplits(spark)
    // warm-up: pay JVM/codegen/parquet-footer costs before any timing.
    // The first query to run a given physical shape (parquet scan →
    // project → HashAggregate → Exchange → Sort) pays its whole-stage
    // codegen + JIT compile (~0.7 s measured); exercise that shape once
    // over a real table so per-query timings measure the query, not the
    // first-compile of common operators.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    Tables.load(spark, sfDir, "nation")
      .groupBy(org.apache.spark.sql.functions.col("n_regionkey"))
      .count().orderBy("n_regionkey").collect()
    // generator + string-function stage (janino's own first compile is
    // the dominant cost: measured 3.9s cold vs 0.4s warm on q55)
    locally {
      import org.apache.spark.sql.functions._
      spark.range(2)
        .select(posexplode(split(regexp_replace(lower(concat(lit("a b "),
          col("id"))), "[^a-z]+", " "), " ")).as(Seq("p", "w")))
        .filter(col("w") =!= "").count()
    }
    // fixpoint-loop shapes (q61/d07): a driver-coordinated loop compiles
    // a fresh join/agg/localCheckpoint plan every round, so first-run
    // codegen multiplies by the round count (d07 measured 5.5 s cold vs
    // 2.8 s warm at sf0.01). One 2-node round compiles the shapes once.
    locally {
      import org.apache.spark.sql.functions._
      graft.operators.Dedup.connectedComponents(
        spark.createDataFrame(Seq((1L, 2L))).toDF("id1", "id2"),
        "id1", "id2").count()
      graft.operators.Relational.recursiveFixpoint(
        spark.range(1).selectExpr("id AS node", "id AS root", "0 AS depth"),
        f => f.filter(lit(false)), maxIter = 2, distinctUnion = false).count()
    }
    var failed = List.empty[String]
    var cleanupNs = 0L // r5 verdict #2: quantify the per-query gc cost
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // `*_gate` queries are CORRECTNESS-only oracle gates (deliberately
    // quadratic exact recomputes that verify the approximate operators —
    // d02/d03, and since r11 d05, the O(n²) exact oracle for d06's LSH
    // path). Benching them would time test scaffolding, not the
    // shipped operator (r5 verdict #1), so the headline excludes them;
    // Verify still runs them and the driver still hash-checks them.
    // An EXPLICIT SPARK_GRAFT_ONLY selection overrides the exclusion —
    // naming a gate means the user wants to time that gate (otherwise
    // the selection silently matched nothing and printed n_queries=0).
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        only match {
          case Some(set) => set.contains(n)
          case None      => !n.endsWith("_gate")
        }
      }
    // r6 verdict #1: a single-pass sweep total is noise-dominated (the
    // driver's r6 sweep read 302 s with d10 at 99 s; the same tree
    // measured 20.5 s isolated — pure box load). Run each query `reps`
    // times and report the per-query MEDIAN: one loaded-box outlier can
    // no longer corrupt the headline, and when it happens it is visible
    // in "outliers" as [first, median, max] instead of silently inflating
    // the total. Sweep wall time stays honest in "sweep_sec".
    val reps = sys.env.get("SPARK_GRAFT_REPS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 1)
      .getOrElse(3)
    def cleanup(): Unit = {
      val c0 = System.nanoTime()
      // Isolate runs from each other: several operators persist()
      // intermediate frames (inverted indexes, LSH buckets) that stay
      // referenced until here and would otherwise pressure the heap of
      // every later run (e01 measured 2s isolated vs 12-23s when run
      // after the dedup block with its caches still resident).
      graft.operators.OperatorCaches.release()
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // ...and force the ContextCleaner's hand: broadcast blocks and
      // shuffle state are only reclaimed when the DRIVER GC collects
      // their references. On an 8g driver heap a 124-query sweep
      // accumulates enough uncollected refs that mid-sweep queries hit
      // multi-second GC stalls (d08 measured 17.4s mid-sweep vs 1.3s in
      // a block run; d09 32.5s vs 4.7s). One explicit GC per run is
      // ~100ms and keeps every measurement a measurement of the query.
      System.gc()
      cleanupNs += System.nanoTime() - c0
    }
    // r10 verdict #2: defend the total against external box load, don't
    // just surface it. A fixed pure-compute control query (codegen'd
    // range-sum — no IO, no shuffle, allocation-light) is timed after
    // every rep; when the control drifts past 1.5× its own pre-sweep
    // median (with a small absolute floor so a ~60 ms control can't flap
    // on scheduler jitter) the box was loaded during that rep, so the
    // rep is DISCARDED and re-run (bounded retries). A rep that still
    // drifts after the retries is kept but its query lands in
    // "flagged" and the sweep verdict becomes "flagged" — the r10
    // incident (a 21 s d10 rep on a 3.4 s query recorded into a 13%
    // phantom headline regression) can no longer be recorded unmarked.
    def controlOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(8L * 1000 * 1000).selectExpr("sum(id % 1000003)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // The persisted IDLE floor for the control query (r11 verdict #1):
    // median of a 30-sample distribution measured on an idle box at the
    // canonical cpus=32 config (min 0.070, p50 0.086, p90 0.102 —
    // PERF.md round-11; re-confirmed r12: a quiet-box sweep here read
    // min 0.092). The ratio control_BASE / floor is the BOX-SPEED
    // FACTOR: ~1.0 on an idle box of this class, >1 when the box is
    // slower or diffusely loaded across the sweep (which per-rep drift
    // detection cannot see — its documented detection floor). Base, NOT
    // min: across r11's three incomparable sweeps the pre-sweep base
    // tracked the totals (0.081→68.9 s, 0.120→97.4, 0.157→151.7;
    // base-normalized: 73.2 / 69.8 / 83.1 — the two CLEAN sweeps land
    // within 5%), while the running min converged to the unloaded floor
    // on every box (0.047–0.056) and so can never move under load.
    // Totals from different sessions/boxes divide by their own
    // box_speed before comparison; the JSON carries both the factor and
    // the normalized total. The floor is calibrated for THIS control
    // query at cpus=32 and versioned here — re-measure if either
    // changes (the control is partition-overhead-bound, so its time
    // varies with the thread count).
    val idleControlFloor = 0.086
    // provenance stamp for the floor constant, carried in the JSON so a
    // stale calibration is visible where the numbers are read (r12
    // verdict #6). Re-measure via SPARK_GRAFT_CALIBRATE when the box
    // class, cpus, or the control query changes.
    // r13 scripted re-measure (3×30 samples, idle): p50 0.095/0.101/
    // 0.112 — today's box session runs 1.1-1.3× the reference floor,
    // which box_speed absorbs by design. The constant stays pinned to
    // the r11 REFERENCE box class; re-pinning it to the current session
    // would reset box_speed to 1.0 and break cross-session totals.
    val floorCal = "ref p50/30 idle cpus=32 r11; r13 re-measure p50 0.095-0.112"
    def ms(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // Scripted re-calibration mode (r12 verdict #6): sample the control
    // N times on what should be an idle box and print the distribution
    // as one JSON line — the PERF.md round-11 procedure as a command.
    // The reader compares p50 against idle_floor and updates the
    // constant (and this stamp) if the box class drifted.
    sys.env.get("SPARK_GRAFT_CALIBRATE").foreach { s =>
      val n = scala.util.Try(s.toInt).toOption.filter(_ > 0).getOrElse(30)
      controlOnce() // pay the control's own first-compile
      val xs = Vector.fill(n)(controlOnce()).sorted
      def pct(p: Double): Double = xs(math.min(n - 1, (p * (n - 1)).round.toInt))
      try spark.stop() catch { case _: Throwable => () }
      println(s"""{"metric":"control_floor","n":$n,"cpus":"$cpus","min":${ms(
        xs.head)},"p50":${ms(pct(0.5))},"p90":${ms(pct(0.9))},"max":${ms(
        xs.last)},"current_floor":$idleControlFloor,"floor_cal":"$floorCal"}""")
      System.out.flush()
      sys.exit(0)
    }
    controlOnce() // pay the control's own first-compile before baselining
    val controlBase = Vector.fill(5)(controlOnce()).sorted.apply(2)
    var controlMax = controlBase
    // The drift test compares against the MINIMUM control ever seen, not
    // the pre-sweep baseline alone: if the box was already loaded while
    // baselining, the base is inflated and a fully-contaminated sweep
    // would read "clean" (r11 review pass). Load only ever inflates the
    // control, so the running min converges on the unloaded figure; if
    // it ends up well below the initial base, the baseline itself was
    // loaded and the sweep verdict says so.
    var controlMin = controlBase
    var controlReruns = 0
    var loadFlagged = Set.empty[String]
    // Drift threshold (r13): the old absolute floor (min + 0.2) was sized
    // for a ~60 ms control but this box's control runs 0.07–0.11 s, so
    // the floor allowed ~3.9× drift unflagged — an r13 sf3 session
    // recorded a 77 s rep of a 14 s-warm query into a "clean" sweep
    // (PERF.md round-13, the d07 adjudication), and the first chaos run
    // showed 24 hogs inflating queries +20% while the control (0.15–0.17)
    // still cleared a min+0.1 bar. Floor tightened to min + 0.05, which
    // makes 1.5×min binding for this control class; the idle tail
    // (calibration p90 up to 0.138, single samples to 0.21 vs min ~0.075)
    // is absorbed by CONFIRMATION instead of a loose floor: a suspicious
    // first sample triggers two more and the median-of-3 decides, so a
    // one-sample scheduler blip costs 0.2 s, not a rerun, while sustained
    // load reads high across all three.
    def driftBar: Double = BenchDefense.driftBar(controlMin)
    def controlDrifted(): Boolean =
      // a control that cannot even run (heap pressure after a heavy rep,
      // transient executor death) is the strongest drift signal there is
      // — and must not abort a 400-second sweep (r11 review pass)
      try {
        def sample(): Double = {
          val c = controlOnce()
          if (c > controlMax) controlMax = c
          if (c < controlMin) controlMin = c
          c
        }
        val c1 = sample()
        if (c1 <= driftBar) false
        else BenchDefense.confirmed(c1, sample(), sample(), driftBar)
      } catch { case _: Throwable => true }
    val maxAttempts = 3
    // stderr marker for external orchestration (scripts/chaos_bench.py
    // keys its load-injection window off this line — timing from sbt
    // launch is unreliable across cold/warm compiles)
    System.err.println(s"BENCH SWEEP BEGIN n=${selected.size} reps=$reps")
    val sweepT0 = System.nanoTime()
    val results = selected.map { case (name, fn) =>
      var times = Vector.empty[Double]
      var ok = true
      var r = 0
      while (r < reps && ok) {
        var accepted = false
        var attempts = 0
        while (!accepted && ok) {
          attempts += 1
          val t0 = System.nanoTime()
          // Consume EVERY computed column, not count(): a count() lets
          // Catalyst prune unevaluated work (window payloads, join payloads
          // — a windowed-asof count() times an empty plan; PERF.md q73
          // methodology). Executing the physical plan's own RDD forces each
          // operator to materialize its full UnsafeRow output — every
          // column evaluated — and the RDD-level count is invisible to
          // Catalyst, so nothing can be rewritten away. This is stronger
          // than agg(count(xxhash64(struct(*)))) and works for all column
          // types (hash() rejects MapType).
          try { fn(spark, sfDir).queryExecution.toRdd.count() }
          catch { case e: Throwable =>
            System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
            // A query is either measured (in "queries"/total) or failed (in
            // "errors", value -1) — never both. A failure on ANY rep voids the
            // earlier reps' times, else a flaky query inflates the headline
            // while also appearing in errors.
            failed ::= name; ok = false; times = Vector.empty
          }
          val dt = (System.nanoTime() - t0) / 1e9
          cleanup()
          if (ok) {
            if (!controlDrifted()) { times :+= dt; accepted = true }
            else if (attempts >= maxAttempts) {
              // kept-and-flagged, not rerun — don't count it as a rerun
              times :+= dt; loadFlagged += name; accepted = true
            } else controlReruns += 1
          }
        }
        r += 1
      }
      name -> times
    }
    val sweepSec = (System.nanoTime() - sweepT0) / 1e9
    // lower median: index (n-1)/2 of the sorted runs (= the middle of 3)
    def median(ts: Vector[Double]): Double = ts.sorted.apply((ts.size - 1) / 2)
    val medians = results.map { case (n, ts) =>
      n -> (if (ts.isEmpty) -1.0 else median(ts))
    }
    val total = medians.map(_._2).filter(_ >= 0).sum
    // a run that strays ≥1.5× AND ≥1s from the median is external load,
    // not the query — surface it instead of letting it hide in a total.
    // Value = the RAW rep times in run order (r9 verdict: the old
    // [first, median, max] triple read like a reps list and made the
    // reported median look like a min — print the actual reps so the
    // reported figure is verifiable as their median).
    val outliers = results.collect {
      case (n, ts) if ts.size >= 2 &&
          ts.max > 1.5 * median(ts) && ts.max - median(ts) > 1.0 =>
        n -> ts.map(ms).mkString("[", ",", "]")
    }
    // the sweep's load verdict: "clean" = every accepted rep saw an
    // undrifted control AND the pre-sweep baseline itself was not
    // inflated (final min well below the initial base ⇒ the box was
    // loaded while baselining, and early reps were judged too leniently);
    // "flagged" = some query kept a possibly-loaded measurement
    // The baseline gets a slightly wider bar than the per-rep test: it is
    // already a median of 5 (tail-resistant), it has no confirmation
    // retry, and controlMin converges DOWN over a 400-sample sweep — at
    // the per-rep bar an honestly idle session (calibration p50 up to
    // 0.112 vs converged min ~0.072) would flag itself a few % of the
    // time (r13 review). Calibrated against observed data: idle bases
    // 0.089–0.134 stay clean, chaos fullload bases 0.155/0.222 flag.
    val baselineLoaded = BenchDefense.baselineLoaded(controlBase, controlMin)
    val loadVerdict =
      if (loadFlagged.nonEmpty || baselineLoaded) "flagged" else "clean"
    // r18 (r17 verdict #2): the r17 sweep's 51 flagged names ate the
    // line budget and left only 9 of 145 per-query entries — starving
    // the driver's round-over-round evidence. The flagged array now
    // sheds NAMES (slowest-first kept, count preserved in
    // "flagged_omitted") before the per-query map sheds entries below
    // ~25; under budget nothing changes. Additions-only: every existing
    // key keeps its meaning, "flagged_omitted" is new.
    val medianOf = medians.toMap
    def line(entries: Seq[(String, Double)], flaggedKeep: Int): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + ms(v) }
        .mkString("{", ",", "}")
      val outs = outliers.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
      val flaggedKept = loadFlagged.toSeq
        .sortBy(n => -medianOf.getOrElse(n, 0.0)).take(flaggedKeep).sorted
      val flg = flaggedKept.map("\"" + _ + "\"").mkString("[", ",", "]")
      val flgOmitted = loadFlagged.size - flaggedKept.size
      // no clamp: a genuinely faster box reads <1 and total_norm
      // correctly inflates to reference-box scale — clamping would
      // normalize slow boxes but not fast ones, leaving cross-session
      // totals asymmetric. If the baseline itself was load-spiked the
      // sweep is already "flagged" (baselineLoaded) and total_norm is
      // to be read as an underestimate. The floor is only calibrated
      // at cpus=32 (the control is partition-overhead-bound): at any
      // other parallelism emit null rather than a silently
      // mis-normalized figure — downstream tooling falls back to the
      // raw total (r12 review pass).
      // ...and only at the canonical partition count: the control's
      // final exchange width follows shuffle.partitions, so a widened
      // session inflates the control for scheduler reasons, not load
      val boxSpeedJson =
        if (cpus == "32" && parts == cpus) {
          val b = controlBase / idleControlFloor
          s""""box_speed":${ms(b)},"total_norm":${ms(total / b)}"""
        } else """"box_speed":null,"total_norm":null"""
      val ctl = s"""{"base":${ms(controlBase)},"min":${ms(controlMin)},"max":${ms(controlMax)},"reruns":$controlReruns,"flagged":$flg,"flagged_omitted":$flgOmitted}"""
      // auto-sized LSH configs chosen during the sweep (r13 ADVICE:
      // cross-sf totals compare different recall regimes unless the
      // chosen banding travels with the numbers)
      val lsh = graft.operators.LshParamsLog.snapshot.toSeq.sorted
        .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
        .mkString("{", ",", "}")
      val omitted = results.size - entries.size
      // "cpus" labels the measurement config: a local[4]-vs-local[32]
      // mixup produced a 2.4x phantom regression at sf1 (r11, PERF.md
      // parallelism-sizing section) — totals from different parallelism
      // are not comparable and must carry their config
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","reps":$reps,"cpus":"$cpus","partitions":"$parts","load":"$loadVerdict",$boxSpeedJson,"idle_floor":$idleControlFloor,"floor_cal":"$floorCal","control":$ctl,"lsh":$lsh,"queries":$qs,"outliers":$outs,"errors":$errs,"omitted":$omitted,"sweep_sec":${ms(sweepSec)},"cleanup_sec":${ms(cleanupNs / 1e9)},"sf":"$sfDir","n_queries":${results.size}}"""
    }
    // fit budget: the driver's tail window is ~2000 chars; stay clear of
    // it. Local analysis runs (full per-query capture to a file) can lift
    // the cap via SPARK_GRAFT_BUDGET.
    val budget = sys.env.get("SPARK_GRAFT_BUDGET")
      .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(1800)
    val bySlowest = medians.sortBy(-_._2)
    var keep = bySlowest.size
    var fkeep = loadFlagged.size
    def render(): String = line(bySlowest.take(keep).sortBy(_._1), fkeep)
    var out = render()
    // shed query entries down to the slowest ~25, then flagged names,
    // then (only if still over) the remaining query entries
    while (out.length > budget && (keep > 1 || fkeep > 0)) {
      if (keep > 25) keep -= 1
      else if (fkeep > 0) fkeep -= 1
      else keep -= 1
      out = render()
    }
    // stop() before printing keeps Spark's shutdown chatter above the JSON
    // line, but must never swallow the measurements if it throws.
    try spark.stop() catch { case _: Throwable => () }
    println(out)
    System.out.flush()
  }
}
