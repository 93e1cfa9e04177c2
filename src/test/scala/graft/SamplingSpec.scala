package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold: boundaries, width, monotonicity") {
    assert(Sampling.hexThreshold(0.0) == "0" * 15)
    assert(Sampling.hexThreshold(1.0) == "g") // above every hex char
    assert(Sampling.hexThreshold(0.5) == "8" + "0" * 14)
    assert(Sampling.hexThreshold(-3.0) == "0" * 15) // clamped
    assert(Sampling.hexThreshold(2.0) == "g")
    val ts = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.99).map(Sampling.hexThreshold)
    assert(ts == ts.sorted, s"thresholds must be monotone in rate: $ts")
    assert(ts.forall(_.length == 15))
  }

  test("stratifiedSample: deterministic, keep-all at rate 1, drop-all at rate 0") {
    val docs = Tables.load(spark, sf, "documents")
    val rates = Map("en" -> 0.5, "fr" -> 1.0, "de" -> 0.0)
    def ids = Sampling.stratifiedSample(docs, "lang", "doc_id", rates,
        defaultRate = 0.2, seed = "spec")
      .select($"doc_id").as[Long].collect().toSet
    val a = ids
    assert(a == ids, "same (corpus, rates, seed) must give the same sample")
    val byLang = Sampling.stratifiedSample(docs, "lang", "doc_id", rates,
        defaultRate = 0.2, seed = "spec")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byLang("fr") == totals("fr"), "rate 1.0 must keep every row")
    assert(!byLang.contains("de"), "rate 0.0 must drop the stratum")
    // defaultRate applies to strata absent from the map (es, zh)
    assert(byLang.keySet.intersect(Set("es", "zh")).nonEmpty,
      "defaultRate 0.2 should keep some rows of unmapped strata")
  }

  test("stratifiedSample: membership is a pure per-row function (batch == union)") {
    // the incremental-ingest contract: sampling a batch in isolation
    // agrees with sampling the whole corpus — no coordination needed
    val docs = Tables.load(spark, sf, "documents")
    val rates = Map("en" -> 0.3)
    def sample(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "lang", "doc_id", rates,
          defaultRate = 0.4, seed = "spec2")
        .select($"doc_id").as[Long].collect().toSet
    val whole = sample(docs)
    val batch = sample(docs.filter($"doc_id" >= 200 && $"doc_id" < 300))
    assert(batch == whole.filter(id => id >= 200 && id < 300))
  }

  test("stratifiedSample: sampled fraction tracks the rate") {
    // statistical sanity, loose bounds (binomial n≈200+, p=0.5)
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.filter($"lang" === "en").count()
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 0.5), defaultRate = 0.0, seed = "spec3").count()
    assert(got > n * 0.3 && got < n * 0.7,
      s"sampled $got of $n at rate 0.5 — hash point not uniform?")
  }

  test("bottomKPerStratum == window row_number over the same hash") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Sampling.bottomKPerStratum(docs, "lang", "doc_id", k = 4,
        seed = "spec4")
      .select($"lang", $"doc_id", $"rnk".cast("int"))
      .as[(String, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang")
      .orderBy(Sampling.hashPoint52($"doc_id", "spec4"), $"doc_id")
    val ref = docs.select($"lang", $"doc_id")
      .withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 4)
      .as[(String, Long, Int)].collect().toSet
    assert(got == ref, s"got=${got.size} ref=${ref.size}")
    assert(got.nonEmpty)
  }

  test("bottomKPerStratum: selection is consistent under corpus growth") {
    // bottom-k sketch property: a doc selected from the FULL corpus that
    // exists in a prefix must also be selected from the prefix (fewer
    // competitors can only promote, never evict)
    val docs = Tables.load(spark, sf, "documents")
    val prefix = docs.filter($"doc_id" < 150)
    def sel(df: org.apache.spark.sql.DataFrame) =
      Sampling.bottomKPerStratum(df, "lang", "doc_id", k = 3, seed = "spec5")
        .select($"lang", $"doc_id").as[(String, Long)].collect().toSet
    val full = sel(docs)
    val pre = sel(prefix)
    val fullInPrefix = full.filter(_._2 < 150)
    assert(fullInPrefix.subsetOf(pre),
      s"full-corpus picks present in the prefix must survive prefix " +
      s"sampling: ${fullInPrefix -- pre}")
  }

  test("weightedSample: weight 1 keeps all, weight 0 drops all, monotone in weight") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0), "w1").count() == n,
      "weight 1.0 must keep every row (hash never reaches 2^52)")
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0), "w1").count() == 0)
    assert(Sampling.weightedSample(docs, "doc_id", lit(7.5), "w1").count() == n,
      "weights clamp to [0,1]")
    // monotone: at a fixed (key, seed), raising the weight only admits
    val lo = Sampling.weightedSample(docs, "doc_id", lit(0.3), "w2")
      .select($"doc_id").as[Long].collect().toSet
    val hi = Sampling.weightedSample(docs, "doc_id", lit(0.7), "w2")
      .select($"doc_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), s"lo∖hi = ${lo -- hi}")
    assert(lo.size < hi.size && hi.size < n)
  }

  test("weightedSample: per-row weights track the weight column") {
    // rows with weight ~0.9 should survive far more often than ~0.1
    val docs = Tables.load(spark, sf, "documents")
    val weighted = docs.withColumn("w",
      when($"doc_id" % 2 === 0, 0.9).otherwise(0.1))
    val kept = Sampling.weightedSample(weighted, "doc_id", $"w", "w3")
      .groupBy(($"doc_id" % 2).as("par")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(kept.getOrElse(0L, 0L) > kept.getOrElse(1L, 0L) * 3,
      s"expected ~9x keep ratio between the weight classes: $kept")
  }

  test("hashSplit: exactly one split per row, proportions track weights, deterministic") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp1")
    val counts = split.groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == n, "no row dropped or duplicated")
    assert(counts("train") > n * 6 / 10, s"train share off: $counts")
    assert(counts("val") < n * 2 / 10 && counts("test") < n * 2 / 10)
    // pure per-row assignment: a row's split is the same in any subset
    val whole = split.select($"doc_id", $"split")
      .as[(Long, String)].collect().toMap
    val sub = Sampling.hashSplit(docs.filter($"doc_id" < 100), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "sp1")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(sub == whole.filter(_._1 < 100))
  }

  test("hashSplit validates weights and names") {
    val docs = Tables.load(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq.empty)
    }
  }

  test("budgetSample == full-window reference, at generous and tight margins") {
    val docs = Tables.load(spark, sf, "documents")
    def ref(budget: Long) = {
      val h = Sampling.hashPoint($"doc_id", "bs1")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy(h.asc, $"doc_id".asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      docs.withColumn("bef", coalesce(sum($"n_chars").over(w), lit(0L)))
        .filter($"bef" < budget)
        .select($"doc_id").as[Long].collect().toSet
    }
    for (budget <- Seq(1000L, 5000L); margin <- Seq(2.0, 1.01)) {
      val got = Sampling.budgetSample(docs, "source", "doc_id", "n_chars",
          budget, "bs1", margin = margin)
        .select($"doc_id").as[Long].collect().toSet
      assert(got == ref(budget),
        s"budget=$budget margin=$margin: got=${got.size} ref=${ref(budget).size}")
      assert(got.nonEmpty)
    }
  }

  test("budgetSample: monotone in budget, exact edges, first-row admission") {
    val docs = Tables.load(spark, sf, "documents")
    def ids(b: Long) = Sampling.budgetSample(docs, "source", "doc_id",
        "n_chars", b, "bs2")
      .select($"doc_id").as[Long].collect().toSet
    val small = ids(800L)
    val big = ids(8000L)
    assert(small.subsetOf(big), "a bigger budget must only admit more")
    assert(small.size < big.size)
    assert(ids(0L).isEmpty, "budget 0 admits nothing")
    assert(ids(100000000L) == docs.select($"doc_id").as[Long].collect().toSet,
      "a budget past every stratum's total admits the whole corpus")
    // budget > 0 admits at least one row per non-empty stratum (the
    // crossing row is included)
    val perStratum = Sampling.budgetSample(docs, "source", "doc_id",
        "n_chars", 1L, "bs2")
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val nStrata = docs.select($"source").distinct().count()
    assert(perStratum.length == nStrata && perStratum.forall(_._2 == 1),
      s"budget 1 must admit exactly the first row of each stratum: ${perStratum.toSeq}")
  }

  test("fail-safe edges: NaN weights drop, null keys drop from splits, negative costs reject") {
    val docs = Tables.load(spark, sf, "documents")
    // NaN weight = broken upstream score — must DROP, not keep-all
    // (Spark orders NaN above every double, so a bare clamp keeps it)
    assert(Sampling.weightedSample(docs, "doc_id",
      lit(Double.NaN), "nan1").count() == 0)
    // null keys are unhashable: hashSplit must drop them, not let them
    // fall through every when() into the last (eval!) split
    val withNull = docs.withColumn("k",
      when($"doc_id" % 7 === 0, lit(null).cast("long")).otherwise($"doc_id"))
    val split = Sampling.hashSplit(withNull, "k",
      Seq("train" -> 0.9, "test" -> 0.1), "sp2")
    assert(split.filter($"k".isNull).count() == 0)
    assert(split.count() == withNull.filter($"k".isNotNull).count())
    // negative costs break the presample-containment proof — fail fast
    val ex = intercept[IllegalArgumentException] {
      Sampling.budgetSample(
        docs.withColumn("c", $"n_chars" - lit(100000L)),
        "source", "doc_id", "c", budget = 500L, seed = "bs3")
    }
    assert(ex.getMessage.contains("negative cost"))
  }

  test("t13 oracle clamp arms: operator == oracle CASE on a negative/overweight fixture") {
    // The unshipped-edge divergence class the r15 verdict named: the
    // operator clamps w ≤ 0 to drop, but a DuckDB oracle without the
    // `<= 0` arm renders printf('%013x', negative) as 16-char
    // two's-complement hex, which sorts ABOVE every 13-char hash — the
    // oracle would KEEP what the operator drops. This fixture replays
    // the AMENDED oracle CASE (the one t13 now ships) in Spark and pins
    // operator == oracle on weights spanning every arm. (NaN/null
    // weights are pinned separately in the fail-safe-edges spec: the
    // shipped oracle column is integer n_chars, where neither exists.)
    val rows = Seq(
      1L -> -5.0, 2L -> -0.0001, 3L -> 0.0, 4L -> 1.0, 5L -> 2.0,
      6L -> 1e18) ++ (10L to 120L).map(i => i -> (i % 10) / 10.0)
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", $"w", seed = "clamp")
      .select($"id").as[Long].collect().toSet
    val oracleKept = df.filter(
      expr("""substr(md5(concat(cast(id as string), ':clamp')), 1, 13) <
              CASE WHEN w >= 1 THEN 'g'
                   WHEN w <= 0 THEN '0000000000000'
                   ELSE format_string('%013x',
                     cast(floor(w * 4503599627370496.0) as bigint)) END"""))
      .select($"id").as[Long].collect().toSet
    assert(got == oracleKept,
      s"operator and amended oracle disagree: ${got.diff(oracleKept)} / " +
      s"${oracleKept.diff(got)}")
    assert(!got.exists(id => id <= 3L), "w <= 0 must drop")
    assert(Set(4L, 5L, 6L).subsetOf(got), "w >= 1 must keep")
    // and the REASON the arm is needed: the negative rendering is
    // 16 chars of 'f'-leading two's-complement hex, which sorts above
    // any 13-char hash not itself starting with that prefix — so an
    // UN-clamped oracle CASE keeps negative-weight rows the operator
    // drops (the divergence the amended arm closes)
    val unclampedKept = df.filter(
      expr("""substr(md5(concat(cast(id as string), ':clamp')), 1, 13) <
              CASE WHEN w >= 1 THEN 'g'
                   ELSE format_string('%013x',
                     cast(floor(w * 4503599627370496.0) as bigint)) END"""))
      .select($"id").as[Long].collect().toSet
    assert(unclampedKept.exists(id => id <= 2L) && unclampedKept != got,
      s"the un-clamped CASE should keep negative-weight rows the " +
      s"operator drops: $unclampedKept")
  }

  test("budgetSample: Long-overflow stratum total fails fast (non-ANSI wrap)") {
    // Under non-ANSI sum semantics a huge-cost stratum wraps negative;
    // phase 1 must reject it explicitly instead of deriving a negative
    // presample rate and dying 64 doublings later with a misleading
    // "did not converge".
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val df = Seq(("a", 1L, Long.MaxValue / 2), ("a", 2L, Long.MaxValue / 2),
        ("a", 3L, Long.MaxValue / 2)).toDF("s", "id", "c")
      val ex = intercept[IllegalArgumentException] {
        Sampling.budgetSample(df, "s", "id", "c", budget = 10L, seed = "ov")
      }
      assert(ex.getMessage.contains("overflowed Long"), ex.getMessage)
      // the nastier wrap: 5 x Long.MaxValue/2 wraps PAST 2^64 back into
      // POSITIVE range — a sign check passes while the total is wrong
      // by 2^64; the exact decimal phase-1 sum must still reject it
      val df5 = (1 to 5).map(i => ("a", i.toLong, Long.MaxValue / 2))
        .toDF("s", "id", "c")
      val ex5 = intercept[IllegalArgumentException] {
        Sampling.budgetSample(df5, "s", "id", "c", budget = 10L, seed = "ov")
      }
      assert(ex5.getMessage.contains("overflowed Long"), ex5.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("budgetSample: all-strata-within-budget skips the coverage scan") {
    // When every stratum total fits the budget, every rate is 1.0 and
    // the phase-2 containment check is vacuous — the operator must not
    // spend a corpus scan on it. Pin by counting jobs launched during
    // construction: the trivial call may only run phase 1; the tight
    // call runs phase 1 plus at least one coverage scan.
    val docs = Tables.load(spark, sf, "documents")
    docs.count() // schema/footer jobs outside the windows
    val sc = spark.sparkContext
    def jobsDuring(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val sentinels = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val grp = Option(js.properties)
            .map(_.getProperty("spark.jobGroup.id")).orNull
          if (grp == "bs-sentinel") sentinels.incrementAndGet() else n.incrementAndGet()
        }
      }
      sc.addSparkListener(listener)
      try {
        sc.clearJobGroup()
        body
        sc.setJobGroup("bs-sentinel", "flush")
        spark.range(1).count()
        sc.clearJobGroup()
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (sentinels.get() < 1 && System.nanoTime() < deadline)
          Thread.sleep(10)
        assert(sentinels.get() >= 1, "listener never saw the sentinel job")
        n.get()
      } finally sc.removeSparkListener(listener)
    }
    val trivial = jobsDuring {
      Sampling.budgetSample(docs, "source", "doc_id", "n_chars",
        budget = Long.MaxValue / 4, seed = "sk1")
    }
    assert(Sampling.lastCoverageRounds.get() == 0,
      "trivial budget must record zero coverage scans")
    val tight = jobsDuring {
      Sampling.budgetSample(docs, "source", "doc_id", "n_chars",
        budget = 500L, seed = "sk1")
    }
    assert(Sampling.lastCoverageRounds.get() >= 1,
      "a sub-1.0-rate call must record its coverage scans")
    assert(trivial < tight,
      s"trivial-budget call must skip the coverage scan: trivial=$trivial " +
      s"tight=$tight")
  }

  test("stratifiedSample rejects out-of-range rates and empty maps") {
    val docs = Tables.load(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, "lang", "doc_id", Map.empty[String, Double])
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.bottomKPerStratum(docs, "lang", "doc_id", k = 0)
    }
  }
}
