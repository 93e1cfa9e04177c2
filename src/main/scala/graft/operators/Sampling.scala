package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deterministic dataset-curation sampling — the dataset-mixing
  * primitives of a training-data pipeline ("keep 50% of en, 10% of zh,
  * all of fr", "take exactly k eval docs per source").
  *
  * Both operators decide membership from a HASH of the row's key, never
  * from `rand()` or row position, which is what makes them usable at
  * 100 TB:
  *  - reproducible: the same (key, seed) always lands on the same side,
  *    across re-runs, task retries, and executor counts — a retried
  *    partition cannot change the sample;
  *  - incremental-consistent: membership is a pure per-row function, so
  *    ingest batches sampled independently agree with sampling the
  *    union (no coordination, no state);
  *  - portable and auditable: the hash is `md5(key ":" seed)` hex — any
  *    engine can recompute the exact membership (the DuckDB oracle
  *    does, verbatim), unlike Spark-internal `hash()`/`sample()` whose
  *    semantics stop at the JVM boundary.
  *
  * [[stratifiedSample]] is completely NARROW (a codegen'd filter — no
  * shuffle, no state; partition-prunes and scans like any filter), the
  * shape a rate-based mix over a 100 TB corpus must have.
  * [[bottomKPerStratum]] ships only k-sized partial buffers per stratum
  * through one exchange ([[graft.functions.BottomKPairs]] — the
  * TopKAggregator shape), never a per-stratum window sort: with a
  * handful of strata over 10¹² rows, `row_number().over(partitionBy)`
  * would sort the entire corpus on a handful of reducers.
  */
object Sampling {

  /** Coverage SCANS the most recent [[budgetSample]] call on THIS
    * thread ran in its phase-2 containment loop — each is one narrow
    * pass over the corpus. 0 = the loop was skipped (every rate already
    * 1.0); 1 = the initial presample proved coverage first try; k > 1 =
    * k−1 rate-doubling rounds were needed (the skew price). A
    * measurement instrument for the skew-cost probe, not API —
    * thread-local so concurrent pipelines don't clobber each other. */
  private[graft] val lastCoverageRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))

  /** 60-bit hash point of a row key in hex space: the first 15
    * lowercase-hex chars of `md5(key ":" seed)`. Kept as a STRING and
    * compared lexicographically — fixed-width hex order is numeric
    * order, both engines compare it identically, and no precision is
    * lost to doubles. */
  def hashPoint(key: Column, seed: String): Column =
    substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 15)

  /** The 13-hex-char (52-bit) prefix of THE SAME hash point as a Long —
    * exact in the typed aggregator's tuple ordering and
    * order-isomorphic to the oracle's substring comparison (fixed-width
    * hex). Derived from [[hashPoint]] so the two operators can never
    * disagree on what the hash of a key is. */
  def hashPoint52(key: Column, seed: String): Column =
    conv(substring(hashPoint(key, seed), 1, 13), 16, 10).cast(LongType)

  /** Hex threshold t (15 chars) with P[hashPoint < t] = rate under a
    * uniform hash. rate ≥ 1 returns "g" — above every hex char, so the
    * strict < keeps everything; rate ≤ 0 returns the all-zero string,
    * below which no hash sorts. */
  private[graft] def hexThreshold(rate: Double): String = {
    val space = BigInt(16).pow(15)
    val clamped = math.min(math.max(rate, 0.0), 1.0)
    val cut = (BigDecimal(space) * BigDecimal(clamped)).toBigInt
    if (cut >= space) "g" else f"$cut%015x"
  }

  /** Per-stratum threshold CASE: the sorted fold of
    * when(strata === s, hexThreshold(rate)) with a default arm — the
    * single construction [[stratifiedSample]] and [[budgetSample]]
    * share (one definition of how a rate map becomes a threshold
    * column). */
  private def rateCase(strata: Column, rates: Map[String, Double],
      defaultRate: Double): Column =
    rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(strata === lit(stratum), lit(hexThreshold(rate))).otherwise(acc)
    }

  /** Rate-based stratified Bernoulli sample: keep a row iff its hash
    * point falls below its stratum's threshold. Strata resolve through
    * a literal CASE over `rates` (mixing maps are small — tens of
    * languages/sources); strata absent from the map fall to
    * `defaultRate`. The returned frame keeps every input column — this
    * is a pure filter. Rows with a null key are unhashable and drop out
    * (the null predicate — the kit's convention). */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: String = "graft"): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample: empty rates map")
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"stratifiedSample: rate out of [0,1]: $r"))
    df.filter(hashPoint(col(keyCol), seed) <
      rateCase(col(strataCol), rates, defaultRate))
  }

  /** Per-row WEIGHTED Bernoulli sample: keep a row with probability
    * `weight` (clamped to [0, 1]) — quality-weighted corpus mixing
    * ("keep high-quality docs with p∝score"). The row's own weight is
    * its threshold: keep iff hashPoint52 < ⌊weight·2⁵²⌋, so weight 1
    * keeps with certainty (the hash never reaches 2⁵²) and weight 0
    * never keeps. Same purity properties as [[stratifiedSample]] —
    * narrow, reproducible, batch-consistent — provided `weight` is
    * itself deterministic per row. The floor (not a rounding cast) is
    * part of the portable definition: engines disagree on
    * double→int rounding, never on floor. A NaN weight DROPS the row
    * (fail-safe: Spark orders NaN above every double, so a bare
    * least/greatest clamp would silently turn a broken upstream score
    * into keep-all); a null weight drops via the null predicate. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      seed: String = "graft"): DataFrame = {
    val wd = weight.cast("double")
    val w = when(isnan(wd), lit(0.0))
      .otherwise(least(greatest(wd, lit(0.0)), lit(1.0)))
    val cut = floor(w * lit(4503599627370496.0)).cast(LongType) // 2^52
    df.filter(hashPoint52(col(keyCol), seed) < cut)
  }

  /** Deterministic multi-way split — train/val/test assignment by hash
    * range: a row's split is the first cut its hash point falls under.
    * Weights must sum to 1 (±1e-9). Appends a `split` column; every
    * HASHABLE row lands in exactly one split (the last split is the
    * ELSE arm, so floating-point cumulation can never leak a row past
    * the end). Rows with a null key are DROPPED like the samplers drop
    * them — without the filter a null hash would fall through every
    * `when` into the last split, silently contaminating the eval split
    * with rows no engine can audit by md5. Same hash point and purity
    * properties as the samplers: membership survives re-runs, retries,
    * and ingest batching. */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      seed: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "hashSplit: empty split list")
    splits.foreach { case (n, w) =>
      require(w >= 0.0 && w <= 1.0, s"hashSplit: weight out of [0,1]: $n=$w") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"hashSplit: weights must sum to 1, got $total")
    require(splits.map(_._1).distinct.size == splits.size,
      "hashSplit: duplicate split names")
    val h = hashPoint(col(keyCol), seed)
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val splitCol = splits.init.zip(cuts.init)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), cut), acc) =>
          when(h < lit(hexThreshold(cut)), lit(name)).otherwise(acc)
      }
    df.filter(col(keyCol).isNotNull).withColumn("split", splitCol)
  }

  /** Per-stratum BUDGET sample — "take B tokens from each source", the
    * pretraining-mix primitive: rows are admitted in hash-point order
    * until the stratum's cumulative cost reaches `budget` (a row is
    * kept iff the cost of the rows BEFORE it is < budget, so a nonzero
    * budget always admits the first row and the crossing row is
    * included). Deterministic and auditable like the other samplers —
    * the admitted set is a pure function of (corpus, seed, budget) —
    * but inherently corpus-dependent (adding docs can evict, exactly
    * like [[bottomKPerStratum]]); it IS monotone in budget (a bigger
    * budget only admits more, spec-pinned).
    *
    * Scale shape: the admitted set is a hash-order PREFIX, so the
    * operator never sorts the corpus. Phase 1 aggregates per-stratum
    * cost totals (one narrow partial agg; only #strata rows reach the
    * driver — the k-means K×dim precedent). Phase 2 presamples each
    * stratum at rate margin·budget/total with [[hashPoint]] (a narrow
    * filter; both the presample and the admitted set are DOWNWARD-
    * CLOSED in the same (hash, id) order, so presample-cost ≥ budget
    * PROVES the presample contains the whole admitted prefix — when a
    * skewed stratum under-covers, the rate doubles and the check
    * re-runs: ≤ log₂(1/rate) driver-side rounds, each one narrow scan.
    * Measured price of the worst case (graft.BudgetSkewProbe at sf1,
    * 50k docs, cost deliberately concentrated on the top 1% of hash
    * space so presamples stay cost-blind until rate ≈ 1): 7 coverage
    * scans vs the uniform corpus's 1, wall 1.76 s vs 1.19 s — the skew
    * tax is the extra scans, each cheap because the scan is a
    * codegen'd filter, and it is BOUNDED: the doubling can never run
    * more than log₂(1/r₀) rounds, adversary or not. Phase 3
    * window-sorts ONLY the presample (≈ margin·budget worth of rows per
    * stratum, never the corpus) to apply the exact cumulative cut.
    * Requires a deterministic input lineage (the phases re-read it). */
  def budgetSample(df: DataFrame, strataCol: String, keyCol: String,
      costCol: String, budget: Long, seed: String = "graft",
      margin: Double = 2.0): DataFrame = {
    require(budget >= 0, s"budgetSample: negative budget: $budget")
    require(margin > 1.0, s"budgetSample: margin must exceed 1: $margin")
    // the three phases must agree on cost arithmetic: phase 1 totals in
    // DECIMAL(38,0) (overflow-proof), phases 2/3 prefix-sum the raw
    // column as Long. With a fractional costCol the DECIMAL cast would
    // round per-row while the prefix sums don't — the phases would cut
    // at silently different totals. Integral costs (token counts,
    // bytes) are the contract; fail fast like the negative-cost check.
    val costType = df.select(col(costCol)).schema.head.dataType
    require(costType match {
      case _: org.apache.spark.sql.types.ByteType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"budgetSample: costCol '$costCol' must be an integral type " +
      s"(token counts, bytes), got $costType — cast to a whole-number " +
      "unit first; the phase-1 overflow-proof DECIMAL totals and the " +
      "phase-2/3 Long prefix sums only agree on integral costs")
    InputContracts.requireDeterministic(df, "budgetSample")
    // reset the instrument BEFORE any early exit, or a budget-0 call
    // would report the previous call's scan count
    lastCoverageRounds.set(0)
    val base = df.filter(col(strataCol).isNotNull) // null strata dropped
    if (budget == 0) return base.filter(lit(false))
    val strata = col(strataCol).cast("string")
    // phase 1: per-stratum totals — #strata rows, driver-bounded. The
    // sums are null-safe (an all-null-cost stratum totals 0, its rows
    // admitted at zero cost like the window treats them), and a
    // NEGATIVE cost fails fast here: the downward-closed containment
    // proof needs a monotone cumulative sum, so with negative costs the
    // presample could exclude rows the exact definition admits.
    // totals are summed as DECIMAL(38,0), not Long: a non-ANSI Long sum
    // wraps silently — negative if you're lucky, but it can wrap PAST
    // 2^64 back into positive range, where a sign check passes and the
    // rate is computed from a total that is wrong by 2^64 (admitting a
    // wrong set with no error). The exact decimal total surfaces every
    // overflow here; once it is proven <= Long.MaxValue, the phase-2/3
    // Long sums are prefix sums of the same non-negative costs and can
    // never wrap.
    val totals = base.groupBy(strata.as("__s"))
      .agg(sum(col(costCol).cast(DecimalType(38, 0))).as("__t"),
        min(col(costCol)).cast(LongType).as("__min"),
        count(col(costCol)).as("__n"))
      .collect()
      .map { r =>
        val mn = if (r.isNullAt(2)) 0L else r.getLong(2)
        require(mn >= 0,
          s"budgetSample: negative cost in stratum '${r.getString(0)}' " +
          s"(min=$mn) — the hash-prefix containment argument requires " +
          "non-negative costs")
        val dec = r.getDecimal(1)
        // null total with non-null costs = even DECIMAL(38,0) overflowed
        require(dec != null || r.getLong(3) == 0L,
          s"budgetSample: stratum '${r.getString(0)}' cost total " +
          "exceeds 38 digits — rescale costCol to a coarser unit")
        val total = if (dec == null) java.math.BigDecimal.ZERO else dec
        require(total.compareTo(
            java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0,
          s"budgetSample: stratum '${r.getString(0)}' cost total $total " +
          s"overflowed Long range (min cost $mn >= 0) — rescale costCol " +
          "to a coarser unit")
        r.getString(0) -> total.longValue()
      }
      .toMap
    val h = hashPoint(col(keyCol), seed)
    // phase 2: rate-doubling until every stratum's presample PROVABLY
    // covers its budget prefix — presample cost ≥ budget, or the whole
    // stratum is in. A stratum absent from the presample aggregation
    // (rate so small no hash falls under it) counts as coverage 0.
    var rates: Map[String, Double] = totals.map { case (s, t) =>
      s -> (if (t <= budget) 1.0 else
        math.min(1.0, margin * budget.toDouble / t.toDouble))
    }
    var guard = 0
    var needDouble = Set.empty[String]
    // every stratum total within budget ⇒ every rate is already 1.0,
    // the presample IS the corpus and containment is trivial — skip the
    // coverage job entirely (it scans the corpus once and can never
    // trigger a doubling)
    while (rates.values.exists(_ < 1.0) && {
      val covered = base.filter(h < rateCase(strata, rates, 0.0))
        .groupBy(strata.as("__s"))
        .agg(coalesce(sum(col(costCol)), lit(0L)).cast(LongType).as("__c"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      needDouble = rates.keySet.filter(s =>
        rates(s) < 1.0 && covered.getOrElse(s, 0L) < budget)
      if (needDouble.nonEmpty)
        rates = rates ++ needDouble.map(s => s -> math.min(1.0, rates(s) * 2))
      guard += 1
      lastCoverageRounds.set(guard)
      require(guard <= 64, "budgetSample: rate doubling did not converge")
      needDouble.nonEmpty
    }) ()
    // phase 3: the exact cumulative cut, windowed over the presample only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata).orderBy(h.asc, col(keyCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.filter(h < rateCase(strata, rates, 0.0))
      .withColumn("__before", coalesce(sum(col(costCol)).over(w), lit(0L)))
      .filter(col("__before") < budget)
      .drop("__before")
  }

  /** Exact-k deterministic sample per stratum: the k rows with the
    * smallest (hash, id) per stratum, returned as
    * (strataCol, keyCol, rnk) with rnk 1..k in hash order. Growing the
    * corpus only ever evicts by hash order (a bottom-k sketch), so the
    * selection is stable under ingest — a doc is evicted, never
    * re-admitted. Keys must be Long (the repo's id convention). The
    * aggregation ships k-sized buffers only; callers wanting full rows
    * semi-join the result back on (strataCol, keyCol). */
  def bottomKPerStratum(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, seed: String = "graft"): DataFrame = {
    require(k >= 1, s"bottomKPerStratum: k must be >= 1, got $k")
    // fail fast on a non-integral key: a silent cast-to-null would
    // surface as an opaque encoder error deep inside the job
    val keyType = df.schema(keyCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, LongType).contains(keyType),
      s"bottomKPerStratum: keyCol '$keyCol' must be an integral id " +
      s"column (the repo's Long id convention), got $keyType")
    val session = df.sparkSession
    import session.implicits._
    val aggc = new graft.functions.BottomKPairs(k).toColumn
    df.filter(col(keyCol).isNotNull)
      .select(col(strataCol).cast("string"), col(keyCol).cast(LongType),
        hashPoint52(col(keyCol), seed))
      .as[(String, Long, Long)]
      .map { case (g, id, h) => (g, (h, id)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(aggc.name("bk"))
      .flatMap { case (g, items) =>
        items.zipWithIndex.map { case ((_, id), r) => (g, id, r + 1) } }
      .toDF(strataCol, keyCol, "rnk")
  }
}
