package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's relational operator surface (SURVEY.md §2.2–2.7),
  * re-expressed as thin, scale-conscious wrappers over the Dataset API.
  *
  * The reference (jackpal/SQLiteDataFrame, SDF.swift:295-304) reaches all
  * of these by handing arbitrary SQL text to SQLite's VDBE; here each is a
  * declarative Spark plan so Catalyst owns pushdown, join strategy and
  * whole-stage codegen. Rules applied throughout:
  *   - never `.collect()` inside an operator (everything stays distributed)
  *   - small dimension sides are broadcast explicitly
  *   - aggregations are plain `groupBy().agg()` so Catalyst plans
  *     partial (map-side) + final hash aggregation automatically
  */
object Relational {

  // §2.2 projections / filters -------------------------------------------

  /** P1/P2: projection; unknown names tolerated (reference drops them
    * silently, SDF.swift:363) behind `lenient=true`, strict by default. */
  def project(df: DataFrame, cols: Seq[String], lenient: Boolean = false): DataFrame = {
    val have = df.columns.toSet
    val want = if (lenient) cols.filter(have) else cols
    df.select(want.map(col): _*)
  }

  /** P3: row predicate. */
  def where(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** P4: SQLite implicit `rowid` — deterministic 1-based LongType id
    * from a total order. Auto-routes on the optimizer's size estimate:
    * frames above `smallBytesMax` take the two-pass partition-offset
    * path ([[withRowIdScaled]] — no SinglePartition exchange, survives
    * a 100× scale-up), genuinely small frames (dimension/result frames)
    * keep the one-window form, which plans fewer jobs and persists
    * nothing. Unknown estimates default to Long.MaxValue and route to
    * the scale path — the safe direction. Both routes return the
    * identical rowid (global rank in `order`) with identical schema. */
  def withRowId(df: DataFrame, order: Seq[Column],
      smallBytesMax: Long = 64L << 20): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > BigInt(smallBytesMax)) withRowIdScaled(df, order)
    else {
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      df.withColumn("rowid",
        row_number().over(w).cast(org.apache.spark.sql.types.LongType))
    }
  }

  /** P4 at scale: two-pass partition-offset rowid. rowid is inherently a
    * total order, but it does NOT need a single-task global sort: range-
    * partition on the order key, sort within partitions (both fully
    * parallel), then global id = per-partition row-count offset + local
    * index. Pass 1 collects only the numPartitions-sized count vector to
    * the driver; pass 2 attaches ids via a broadcast-joined offset table
    * — no `Window.orderBy` without partitioning, no SinglePartition
    * exchange anywhere (PlanSpec-asserted), so this survives a 100×
    * scale-up where [[withRowId]]'s one sorting task dies.
    *
    * The local index rides `monotonically_increasing_id()` (= taskPid
    * << 33 | sequential-index), read AFTER the range shuffle + local
    * sort, so `mono >> 33` is the range-partition id and
    * `mono & (2^33-1)` the within-partition rank. Ids are the global
    * rank in `order` regardless of where the range boundaries fall, so
    * the result is deterministic across input partitionings
    * (ScaleSpec-asserted) — provided `order` is a total order, the same
    * contract the reference's rowid scan gives (SDF.swift:295-304 reads
    * SQLite's rowid, which is a physical total order).
    *
    * The range-sorted frame is persisted (both passes read it) and the
    * cache stays pinned until the caller releases it — Spark never
    * auto-unpersists on action completion. The persist registers in
    * [[OperatorCaches]]: callers running many of these in one session
    * release between batches via `OperatorCaches.release()` (or the
    * blunt `spark.catalog.clearCache()`); Bench and Verify both do. */
  def withRowIdScaled(df: DataFrame, order: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mono", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    OperatorCaches.track(sorted)
    // pass 1: per-partition counts — n rows to the driver, nothing else
    val counts = sorted
      .groupBy(shiftright(col("__mono"), 33).as("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offRows = counts.map { case (pid, c) =>
      val o = acc; acc += c
      org.apache.spark.sql.Row(pid, o)
    }.toSeq
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType, nullable = false))))
    // pass 2: broadcast-join the offsets (O(1)/row; a map-literal lookup
    // would be O(numPartitions)/row) and add the 1-based global id
    sorted
      .withColumn("__pid", shiftright(col("__mono"), 33))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("rowid",
        col("__off") + col("__mono").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__pid", "__off", "__mono")
  }

  /** P6 */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  // §2.3 joins ------------------------------------------------------------

  def innerJoin(l: DataFrame, r: DataFrame, on: Column): DataFrame = l.join(r, on, "inner")
  def leftJoin(l: DataFrame, r: DataFrame, on: Column): DataFrame  = l.join(r, on, "left")
  def rightJoin(l: DataFrame, r: DataFrame, on: Column): DataFrame = l.join(r, on, "right")
  def fullJoin(l: DataFrame, r: DataFrame, on: Column): DataFrame  = l.join(r, on, "full")
  def crossJoin(l: DataFrame, r: DataFrame): DataFrame             = l.crossJoin(r)
  def semiJoin(l: DataFrame, r: DataFrame, on: Column): DataFrame  = l.join(r, on, "left_semi")
  def antiJoin(l: DataFrame, r: DataFrame, on: Column): DataFrame  = l.join(r, on, "left_anti")

  /** J5/J9: theta join. When one side is a dimension, broadcast it so the
    * plan is BroadcastNestedLoop over the small side rather than a
    * cartesian shuffle. */
  def thetaJoin(big: DataFrame, small: DataFrame, cond: Column): DataFrame =
    big.join(broadcast(small), cond, "inner")

  /** J8: USING-style equi-join that dedups the key columns. */
  def joinUsing(l: DataFrame, r: DataFrame, keys: Seq[String], how: String = "inner"): DataFrame =
    l.join(r, keys, how)

  // §2.6 sorts / limits ----------------------------------------------------

  def sortBy(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  /** O3: top-k — `orderBy().limit()` lowers to TakeOrderedAndProject:
    * per-partition heaps + single reduce, no global sort shuffle. */
  def topK(df: DataFrame, k: Int, keys: Column*): DataFrame = df.orderBy(keys: _*).limit(k)

  /** J9: as-of join — for each left row, the most recent right row with
    * `rightTs < leftTs` (strict) or `<= leftTs` (inclusive) per key.
    *
    * Scale-first shape: instead of an equi-join (which explodes on hot
    * keys: every left row × every earlier right row, then a window to
    * keep one), tag and UNION both sides, sort once per key by time, and
    * carry the latest right payload forward with `last(_, ignoreNulls)`.
    * One shuffle + one sort, output exactly |left| rows — the classic
    * distributed as-of. Right payload arrives as a struct column
    * (`asofCol`), null when no earlier right row exists. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      asofCol: String = "asof", strict: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val payStruct = struct(rightPayload.map(col): _*)
    val payType = StructType(right.select(rightPayload.map(col): _*).schema.fields)
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val leftType = StructType(left.schema.fields)
    val lTagged = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__isL"),
      lit(null).cast(payType).as("__r"), leftStruct.as("__l"))
    val rTagged = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__isL"),
      payStruct.as("__r"), lit(null).cast(leftType).as("__l"))
    // at equal ts: left-first ⇒ the left row cannot see the right row
    // (strict <); right-first ⇒ it can (inclusive <=)
    val tieOrder = if (strict) col("__isL").desc else col("__isL").asc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      .orderBy(col("__ts").asc, tieOrder)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isL") === 1)
      .select(col("__l.*") +: Seq(col("__match").as(asofCol)): _*)
  }

  /** J9 via the custom physical operator ([[graft.plans.AsofJoinExec]] —
    * the §7.3 ladder's whole-operator rung): same semantics and argument
    * shape as [[asofJoin]], but planned as a sort-merge as-of join (hash
    * co-partition on the key, per-partition (key, ts) sort, single
    * forward merge with one buffered right payload). Output carries the
    * right payload as flat nullable columns rather than a struct.
    * Key/ts column types must match between the sides (checked at plan
    * construction — a mismatch is an error, never a silent cast).
    * Tie contract: when several right rows share a (key, ts), the match
    * is deterministic — the payload-wise greatest row for backward
    * as-of, the payload-wise least for forward (the exec sorts the right
    * side by (key, ts, payload...)); only if every payload column is
    * unorderable (map type) does the pick remain unspecified.
    * Requires the session to have graft strategies enabled
    * (`Graft.enableOptimizations` / `GraftExtensions`) — this method
    * ensures it. */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      strict: Boolean = true, forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graft.glue
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    graft.Graft.enableOptimizations(spark)
    val lPlan = glue.analyzed(left)
    val rPlan0 = glue.analyzed(right)
    // self-join hygiene: if the two sides share attribute ids (same source
    // scan), re-alias the right side so references stay unambiguous — the
    // same dedup the analyzer does for Join nodes
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    glue.ofRows(spark, graft.plans.AsofJoinPlan(
      lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTs), attr(rPlan, rightTs),
      rightPayload.map(attr(rPlan, _)), strict, forward))
  }

  /** W4 dialect-gap recipe: SQLite (≥3.28) window `GROUPS BETWEEN n
    * PRECEDING AND CURRENT ROW` frames with `EXCLUDE` variants, which
    * Spark's Window API lacks, by composition:
    *   - GROUPS distance = dense_rank distance, so a RANGE frame over
    *     the dense_rank of the order key is exactly a GROUPS frame
    *     (whole peer groups enter and leave together)
    *   - EXCLUDE CURRENT ROW / GROUP / TIES are frame-sum arithmetic
    *     with the peer-group sum (partition by (part, rank))
    * Three window passes over one shuffle'd sort order — Catalyst plans
    * a single Exchange; the extra passes are narrow. Adds four columns:
    * `prefix`, `prefix_excl_row`, `prefix_excl_group`, `prefix_excl_ties`. */
  def withGroupsFrameSum(df: DataFrame, partCol: String, orderCol: String,
      valueCol: String, precedingGroups: Int, prefix: String = "g_sum"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withDr = df.withColumn("__dr",
      dense_rank().over(Window.partitionBy(col(partCol)).orderBy(col(orderCol))))
    val wFrame = Window.partitionBy(col(partCol)).orderBy(col("__dr"))
      .rangeBetween(-precedingGroups, 0)
    val wPeer = Window.partitionBy(col(partCol), col("__dr"))
    // NULL values contribute nothing to a SQL sum, so EXCLUDE arithmetic
    // must subtract/add 0 for them — not NULL-poison the result
    val v0 = coalesce(col(valueCol), lit(0))
    val peerSum = coalesce(sum(col(valueCol)).over(wPeer), lit(0))
    withDr
      .withColumn(prefix, sum(col(valueCol)).over(wFrame))
      .withColumn(s"${prefix}_excl_row", col(prefix) - v0)
      .withColumn(s"${prefix}_excl_group", col(prefix) - peerSum)
      .withColumn(s"${prefix}_excl_ties", col(prefix) - peerSum + v0)
      .drop("__dr")
  }

  /** Sliding value-band count, scale path: `count(*) OVER (PARTITION BY
    * part ORDER BY v RANGE BETWEEN width PRECEDING AND CURRENT ROW)`
    * computed as the DIFFERENCE OF TWO CUMULATIVE COUNTS instead of a
    * sliding RANGE frame. Spark's window engine has no aggregate
    * retraction, so a sliding frame RE-AGGREGATES its contents for every
    * row — O(n × frame) work that q33 measures at ~4.3 s for 150k rows
    * with ~1k-row bands, and that grows with the square of density at
    * 100 TB.
    * Identity: n_in_band(x) = cnt(v ≤ x) − cnt(v < x − width). Both terms
    * are cumulative sums over ONE sorted pass: each source row emits a
    * (+1, value) event plus two zero-weight probes at `x` and `x − width`;
    * probe tags order so the upper probe sorts AFTER equal-valued sources
    * (≤) and the lower probe BEFORE them (<). One shuffle, one window
    * sort over 3n rows, O(n) aggregation — and the recipe generalizes to
    * any invertible aggregate (sum/avg) by weighting the events.
    * `idCol` must be row-unique — row identity comes from data, never
    * from monotonically_increasing_id (retry-stable, the saltedJoin
    * lesson). Differential-tested against the rangeBetween form (q82 vs
    * q33: same oracle text, different plan).
    *
    * Contract: `valueCol` must be a FLOATING/INTEGRAL numeric — band
    * boundaries are computed in double (`x − width`). DecimalType is
    * rejected up front: its exact arithmetic can place a row on the
    * opposite side of a boundary than the double round-trip would,
    * silently diverging from the native-type RANGE-frame answer (r5
    * advice); use the rangeBetween window form for decimals. */
  def rangeBandCount(df: DataFrame, partCol: String, valueCol: String,
      width: Double, idCol: String, out: String = "n_in_band"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.schema(valueCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.DecimalType],
      s"rangeBandCount: '$valueCol' is DecimalType — boundaries are " +
        "computed in double and could misclassify boundary rows; cast " +
        "explicitly or use a RANGE BETWEEN window frame")
    val base = df.withColumn("__rid", col(idCol))
    // tag order within equal values: lower probe (-1) < source (0) < upper probe (1)
    val idType = base.schema("__rid").dataType
    val events = base.select(col(partCol), col(valueCol).cast("double").as("__v"),
        lit(0).as("__tag"), lit(1L).as("__w"), lit(null).cast(idType).as("__rid"),
        lit(null).cast("string").as("__side"))
      .unionByName(base.select(col(partCol), col(valueCol).cast("double").as("__v"),
        lit(1).as("__tag"), lit(0L).as("__w"), col("__rid"), lit("hi").as("__side")))
      .unionByName(base.select(col(partCol),
        (col(valueCol).cast("double") - lit(width)).as("__v"),
        lit(-1).as("__tag"), lit(0L).as("__w"), col("__rid"), lit("lo").as("__side")))
    val w = Window.partitionBy(col(partCol)).orderBy(col("__v"), col("__tag"))
    val cum = events.withColumn("__cnt", sum(col("__w")).over(w))
      .filter(col("__rid").isNotNull)
      .groupBy(col("__rid"))
      .agg((max(when(col("__side") === "hi", col("__cnt"))) -
        max(when(col("__side") === "lo", col("__cnt")))).as(out))
    base.join(cum, Seq("__rid")).drop("__rid")
  }

  /** Interval (range) join, scale path. A time-containment theta join
    * (`lTs BETWEEN rStart AND rEnd`) plans as BroadcastNestedLoopJoin —
    * quadratic work and a broadcast of a whole side; at 100 TB it simply
    * does not run. Binning recovers an equi-join: the left row hashes to
    * its time bin, the right interval replicates to every bin it
    * overlaps (bounded by `binSeconds` ≈ the typical interval length,
    * so the blow-up factor is ~interval/bin + 1), the bin equi-join
    * shuffles hash-partitioned like any other join, and an exact
    * containment filter finishes. Each matching pair meets in exactly
    * one bin — the left row's — so no dedup pass is needed.
    * Same shape Flink/streaming engines use for interval joins; the
    * streaming twin is [[graft.streaming.EventStreams.clickAttribution]].
    * Containment is `rStart <= lTs < rEnd` (half-open; `inclusiveEnd`
    * for BETWEEN semantics). `key` adds an equality predicate that
    * rides the same shuffle for free. */
  def intervalJoin(left: DataFrame, lTs: String, right: DataFrame,
      rStart: String, rEnd: String, key: Option[(String, String)] = None,
      binSeconds: Long = 3600, inclusiveEnd: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def secs(c: org.apache.spark.sql.Column) = c.cast(TimestampType).cast(LongType)
    val l = left.withColumn("__bin", floor(secs(col(lTs)) / binSeconds))
    val r = right.withColumn("__bin",
      explode(sequence(floor(secs(col(rStart)) / binSeconds),
                       floor(secs(col(rEnd)) / binSeconds))))
    // frame-qualified refs throughout: shared column names between the
    // two sides must not make the join condition ambiguous
    val endCmp = if (inclusiveEnd) l(lTs) <= r(rEnd) else l(lTs) < r(rEnd)
    val binEq = l("__bin") === r("__bin")
    val cond = key match {
      case Some((lk, rk)) => binEq && l(lk) === r(rk)
      case None           => binEq
    }
    l.join(r, cond && l(lTs) >= r(rStart) && endCmp, "inner")
      .drop("__bin")
  }

  /** S4: the reference's incremental re-read (`readSQL`, SDF.swift:406-531)
    * appends a fresh result set into an existing frame, matching columns
    * BY POSITION. Spark union is positional too, but we enforce width and
    * rename so the result keeps the existing frame's column names. */
  def appendByPosition(existing: DataFrame, batch: DataFrame): DataFrame = {
    require(existing.columns.length == batch.columns.length,
      s"width mismatch: ${existing.columns.length} vs ${batch.columns.length}")
    existing.union(batch.toDF(existing.columns: _*))
  }

  // §2.7 set ops -----------------------------------------------------------

  def unionAll(l: DataFrame, r: DataFrame): DataFrame     = l.unionByName(r)
  def unionDistinct(l: DataFrame, r: DataFrame): DataFrame = l.unionByName(r).distinct()
  def intersect(l: DataFrame, r: DataFrame): DataFrame    = l.intersect(r)
  def except(l: DataFrame, r: DataFrame): DataFrame       = l.except(r)
  /** Multiset (bag) variants — `INTERSECT ALL` / `EXCEPT ALL`. */
  def intersectAll(l: DataFrame, r: DataFrame): DataFrame = l.intersectAll(r)
  def exceptAll(l: DataFrame, r: DataFrame): DataFrame    = l.exceptAll(r)

  /** `WITH RECURSIVE` (SQLite supports it through the reference's SQL
    * entry points, SDF.swift:295-304; Spark has no native recursive CTE)
    * as a driver-coordinated fixpoint loop — the same shape every
    * distributed graph framework uses for iteration (Pregel supersteps).
    *
    * Semantics:
    *   - `distinctUnion = true`  ≡ `base UNION step(...)`: each round
    *     keeps only rows never seen before (`except` vs the accumulator),
    *     so cyclic graphs terminate (transitive closure, reachability).
    *   - `distinctUnion = false` ≡ `base UNION ALL step(...)`: rows pass
    *     through untouched; termination relies on `step` eventually
    *     producing an empty frame (hierarchy walks with a depth column).
    *
    * Scale notes: each iteration is one Spark job over ONLY the frontier
    * (not the accumulator), and `localCheckpoint` truncates the logical
    * plan so iteration N's plan doesn't embed N copies of the lineage —
    * without it the optimizer re-analyzes a plan that doubles per round.
    * On a real cluster with reliable storage prefer `checkpoint` (HDFS)
    * over `localCheckpoint` for fault tolerance; the loop itself is a
    * per-round driver barrier, inherent to any fixpoint. The driver never
    * holds rows — only emptiness checks run actions. */
  def recursiveFixpoint(
      base: DataFrame,
      step: DataFrame => DataFrame,
      maxIter: Int = 50,
      distinctUnion: Boolean = true): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")
    // The accumulator is the lazy union of the per-round checkpointed
    // frontiers — never re-materialized (the earlier form re-checkpointed
    // acc every round: O(total) copy work per round, and the dominant
    // cost of the whole loop at bench scale).
    var frontiers = List((if (distinctUnion) base.distinct() else base).localCheckpoint())
    // except() is positional: re-align every step result to the base
    // column order so a step that returns the same names in a different
    // order can't silently dedup against the wrong columns (a missing
    // column fails loudly here instead).
    val baseCols = base.columns.toSeq
    def acc: DataFrame = frontiers.reduceLeft(_ unionByName _)
    var rounds = 0
    var done = frontiers.head.isEmpty
    while (!done && rounds < maxIter) {
      val stepped = step(frontiers.head).select(baseCols.map(col): _*)
      val next =
        (if (distinctUnion) stepped.distinct().except(acc) else stepped)
          .localCheckpoint()
      done = next.isEmpty
      if (!done) {
        frontiers ::= next
        rounds += 1
      }
    }
    if (!done)
      throw new IllegalStateException(
        s"recursiveFixpoint: no fixpoint after $maxIter iterations")
    acc
  }
}
