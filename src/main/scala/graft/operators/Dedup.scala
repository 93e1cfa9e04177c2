package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.functions.SimHash64

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the 100 TB contract):
  *  - candidate generation is always a *bucketed equi-join* (LSH band,
  *    simhash chunk, shared shingle) — never a cross join
  *  - signatures are built in one narrow pass (arrays of built-in
  *    expressions or the fused SimHash64 native expression)
  *  - pathological buckets (a shingle/band shared by thousands of docs)
  *    are capped with `maxBucket` — standard LSH practice; at 100 TB an
  *    uncapped hot bucket is a quadratic blowup on one executor
  *
  * Caching contract: operators that read an intermediate frame from
  * several passes and cannot express that as one exchange
  * ([[ngramJaccardPairs]]'s shingle frame on the prefix-filter branch,
  * [[ngramJaccardPairsFrom]]'s capped inverted index,
  * [[ngramJaccardIncremental]]'s capped path) `persist()` it; the cache
  * cannot be released inside the operator because the returned frame is
  * lazy and still reads it. Every such persist is registered in
  * [[OperatorCaches]] — the CALLER runs `OperatorCaches.release()`
  * after consuming the result (Bench/Verify clear globally per query);
  * in a long-lived session each un-released call otherwise pins
  * executor storage memory. [[dedupMinHashPairs]], [[cosineNearDupLSH]]
  * and the low-threshold UNCAPPED Jaccard path are deliberately
  * cache-free: their whole input lineage is computed once inside a
  * single explicitly-repartitioned exchange that every consumer reuses
  * (plan-asserted in PlanSpec — see the in-method notes for the two
  * Catalyst rewrites, null-filter pushdown and column pruning, that
  * must be neutralized for ReuseExchange to fire), so they register
  * nothing. [[connectedComponents]] releases its per-round checkpoints
  * eagerly inside the loop and registers only the final one. Callers
  * that already hold a persisted [[shingleFrame]] should use the
  * `*From` variants, which add no caching of their own beyond the
  * capped index.
  *
  * Construction is JOB-FREE across the family: no builder runs a Spark
  * job before the returned frame executes (pinned by a listener spec);
  * capped-vs-uncapped is decided by comparing `maxDocFreq` to [[NoCap]],
  * never by counting the data.
  */
object Dedup {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  // ---- shingling --------------------------------------------------------

  /** Distinct word k-grams of the normalized text — fused native
    * expression (one string walk; the equivalent built-in HOF composition
    * runs interpreted and was the dominant cost of the whole LSH
    * pipeline, see PERF.md). */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.ShingleWords.shingleWords(text, k)

  // ---- exact ------------------------------------------------------------

  /** Exact dedup on the normalized-text fingerprint: one hash-shuffle,
    * keeps the lowest id per group (deterministic representative). */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    df.withColumn("__fp", fp)
      .withColumn("__keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__fp", "__keep")
  }

  /** Exact-dup group summary: (n_docs, n_distinct, n_dup_groups). */
  def exactDupStats(df: DataFrame, textCol: String): DataFrame = {
    val groups = df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("cnt"))
    groups.agg(
      sum(col("cnt")).as("n_docs"),
      count(lit(1)).as("n_distinct"),
      count(when(col("cnt") > 1, lit(1))).as("n_dup_groups"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Mersenne prime 2^31-1: permutation arithmetic stays far below 2^63,
    * so ANSI mode (Spark 4 default — overflow throws) is safe. */
  val MinHashPrime = 2147483647L

  /** Deterministic hash-permutation constants a∈[1,P), b∈[0,P). */
  private def perms(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (1L + math.floorMod(rnd.nextLong(), MinHashPrime - 1),
       math.floorMod(rnd.nextLong(), MinHashPrime)))
  }

  /** MinHash signature (array<long>, one slot per hash function):
    * sig_i = min over shingles of (a_i * h(s) + b_i mod P) with
    * h = xxhash64 folded into [0, P). One narrow pass, overflow-free. */
  def minhashSignature(shingleArr: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    array(perms(numHashes, seed).map { case (a, b) =>
      array_min(transform(shingleArr,
        s => pmod(pmod(xxhash64(s), lit(MinHashPrime)) * lit(a) + lit(b), lit(MinHashPrime))))
    }: _*)

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows; each band hashes to a bucket key. Returns
    * array<struct<band:int, bucket:long>> for exploding. */
  def lshBands(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
             xxhash64(concat_ws(",",
               slice(sig, b * rows + 1, rows).cast(ArrayType(StringType)))).as("bucket"))
    }: _*)
  }

  /** Candidate pairs from LSH buckets (id1 < id2), hot buckets capped.
    * ONE shuffle: group each bucket's ids with a size-capped collector
    * ([[graft.functions.CappedCollector]] — bounded buffer, partial
    * aggregation, saturation detectable as size > cap), drop saturated
    * buckets, then pair generation is a narrow double-explode over the
    * sorted id list. Replaces the count-agg + semi-join + self-join
    * chain (4 shuffles, and the self-join materialized every bucket
    * twice) that profiling showed dominated the whole LSH pipeline at
    * small scale and shuffles bucket contents twice at any scale. */
  private def bucketPairs(exploded: DataFrame, idCol: String, maxBucket: Int,
      numPartitions: Int = 0): DataFrame = {
    val cappedIds = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    // Shuffle width follows the INTERMEDIATE volume, not the input
    // (r14): the banded-LSH caller can generate orders of magnitude
    // more candidate pairs than input rows (582M pairs from 60k
    // vectors at the sf3 recall-first point), and at the session's
    // corpus-sized width the pair dedup sort-spilled a 75 GB disk to
    // death. When the caller states a width, pre-partitioning on the
    // grouping/dedup keys makes BOTH wide stages run at it (the
    // aggregates' required distribution is already satisfied, so no
    // narrower re-exchange is planned).
    val grouped =
      (if (numPartitions > 0)
         exploded.repartition(numPartitions, col("band"), col("bucket"))
       else exploded)
      .groupBy(col("band"), col("bucket"))
      .agg(cappedIds(col(idCol)).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
      .select(sort_array(col("__ids")).as("__ids"))
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "id1")))
      .select(col("id1"),
        explode(slice(col("__ids"), col("__i") + lit(2), size(col("__ids")))).as("id2"))
      // strict: a duplicate id inside one bucket (same doc ingested
      // twice) must not produce a (x, x) self-pair
      .filter(col("id1") < col("id2"))
    (if (numPartitions > 0)
       grouped.repartition(numPartitions, col("id1"), col("id2"))
     else grouped)
      .distinct()
  }

  /** Explode-based MinHash signatures: one xxhash64 per (doc, shingle),
    * then numHashes `min` aggregates in a single hash aggregation —
    * Catalyst plans partial (map-side) + final, so the shuffle carries one
    * 64-slot row per doc, not the shingle stream. ~50× faster than the
    * per-row array-transform form (which re-traverses the shingle array
    * once per hash function) and the shape that survives 100 TB. */
  def minhashSignatures(inv: DataFrame, idCol: String,
      numHashes: Int, seed: Long = 42L): DataFrame = {
    val hashed = inv
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MinHashPrime)))
    val aggs = perms(numHashes, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MinHashPrime))).as(s"__m$i")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** True when the frame's `sh` column carries pre-hashed gram keys
    * (the [[shingleFrame]] default since ShingleHashes) rather than the
    * legacy gram strings a caller may still hand-build. */
  private def shPreHashed(withShingles: DataFrame): Boolean =
    withShingles.schema("sh").dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }

  /** The `sh` column as hashed 64-bit gram keys regardless of encoding:
    * pre-hashed frames pass through untouched; legacy string frames pay
    * the interpreted `transform(xxhash64)` here (HOFs run outside
    * whole-stage codegen — the reason [[shingleFrame]] hashes at shingle
    * time instead). */
  private def hashedSh(withShingles: DataFrame): Column =
    if (shPreHashed(withShingles)) col("sh")
    else transform(col("sh"), s => xxhash64(s))

  /** Inverted index (id, shingle-hash) derived from a persisted
    * (id, shingle-array) frame. Shingles are folded to 64-bit xxhash64
    * keys *before* anything shuffles: every downstream join/groupBy then
    * moves 8-byte longs instead of multi-word strings — at 100 TB the
    * shuffle volume of the candidate join is the dominant network cost,
    * and 64 bits keeps the collision odds (~|shingles|²/2⁶⁴) negligible.
    * With a [[shingleFrame]] input the fold already happened at shingle
    * time and this is a plain explode. The array frame (not the exploded
    * stream) is what persists: doc sizes then come from `size(sh)` as a
    * narrow map instead of a count-per-id shuffle over the exploded
    * index. */
  private def invFromShingles(withShingles: DataFrame, idCol: String,
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    // `carry` columns (e.g. the doc's distinct-gram count for inline
    // Jaccard denominators) attach narrowly at explode time — a few
    // bytes per index row through the shuffle instead of a separate
    // size-aggregation join afterwards. This is the ONE place the
    // pre-hashed/legacy `sh` encoding is dispatched; branches needing
    // extra columns pass them here rather than re-implementing it.
    val carried = carry.map { case (n, c) => c.as(n) }
    if (shPreHashed(withShingles))
      withShingles.select(col(idCol) +: carried :+ explode(col("sh")).as("shingle"): _*)
    else
      withShingles.select(col(idCol) +: carried :+ explode(col("sh")).as("__s"): _*)
        .select(col(idCol) +: carry.map(c => col(c._1)) :+
          xxhash64(col("__s")).as("shingle"): _*)
  }

  /** Per-doc distinct-shingle counts, narrow (shingle arrays are distinct
    * by construction — ShingleWords emits each k-gram once). */
  private def sizesFromShingles(withShingles: DataFrame, idCol: String): DataFrame =
    withShingles.select(col(idCol), size(col("sh")).cast(LongType).as("sz"))

  /** (id, shingle-array) frame — the object a multi-pass dedup pipeline
    * computes ONCE and feeds to every pass (MinHash, exact Jaccard,
    * incremental): shingling is the dominant narrow-map cost, and at
    * 100 TB re-tokenizing the corpus per pass is pure waste. Caller owns
    * persistence (persist before fanning out to several passes).
    *
    * `sh` carries the grams' xxhash64 keys (array<long>, fused
    * ShingleHashes pass), not the gram strings: every consumer — MinHash
    * permutations, the inverted index, array-intersect verification —
    * works on 64-bit keys, so hashing once here shrinks the persisted
    * frame ~8× and removes a per-consumer re-hash (which, as a
    * higher-order `transform`, ran interpreted). All `*From` operators
    * also still accept a caller-built array<string> frame. */
  def shingleFrame(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    df.select(col(idCol),
      graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh"))

  /** (bands, rowsPerBand) for [[dedupMinHashPairsFrom]] holding recall ≥
    * `recallFloor` for pairs AT the Jaccard threshold boundary. A band
    * of r minhash rows matches w.p. j^r, so boundary recall =
    * 1−(1−t^r)^bands. The DEFAULT 64-hash/16-band config (r = 4) holds
    * 0.95 recall only for j ≥ 0.645 — the proven regime its callers run
    * in (d02 at t = 0.8, where the corpus's engineered dups sit at
    * j ≥ 0.9) — and reads ~4% at a t = 0.2 boundary (r13 verdict #3;
    * spec-measured on synthetic boundary pairs). For lower thresholds
    * size with THIS: r is chosen MAXIMAL subject to bands(r)·r ≤
    * maxHashes, because r is the background-rejection lever (candidate
    * volume ~ bands·n²·E[j_bg^r]) while bands then hold the floor.
    * Fails fast when the floor cannot fit maxHashes even at r = 1 —
    * a sizer that silently under-delivers recall is the r13 defect. */
  def minHashParamsFor(threshold: Double, recallFloor: Double = 0.95,
      maxHashes: Int = 256): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1): $threshold")
    require(recallFloor > 0.0 && recallFloor < 1.0,
      s"recallFloor must be in (0,1): $recallFloor")
    def bandsFor(r: Int): Int = math.max(1, math.ceil(
      math.log1p(-recallFloor) / math.log1p(-math.pow(threshold, r))).toInt)
    require(bandsFor(1) <= maxHashes,
      s"minHashParamsFor: recall floor $recallFloor at threshold " +
      s"$threshold needs ${bandsFor(1)} bands even at rowsPerBand=1 — " +
      s"raise maxHashes (now $maxHashes) or lower the floor")
    val r = (1 to 32).takeWhile(r => bandsFor(r).toLong * r <= maxHashes).last
    (bandsFor(r), r)
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id1, id2, jaccard) for pairs ≥ threshold.
    *
    * Recall regime of the DEFAULT banding (64 hashes / 16 bands of 4):
    * ≥ 0.95 for pairs with j ≥ 0.645, near-total at the proven t = 0.8
    * operating point, but decaying fast below — at a t = 0.2 boundary a
    * pair is found w.p. ~4%. For thresholds under ~0.65 pass banding
    * from [[minHashParamsFor]] instead (measured: d02_recall_gate and
    * the boundary-recall spec in PipelineOpsSpec). */
  def dedupMinHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame =
    // no persist: the *From plan reads the frame through exactly one
    // reused exchange (r11 sf1 A/B: 6.7 → 3.2 s — the old persisted
    // frame was first-filled by three racing consumers)
    dedupMinHashPairsFrom(shingleFrame(df, idCol, textCol, k), idCol,
      numHashes, bands, threshold, maxBucket)

  /** [[dedupMinHashPairs]] over a prepared [[shingleFrame]].
    *
    * The frame goes through one id-keyed exchange before fanning out to
    * its three consumers (the signature/banding leg and verifyJaccard's
    * two array-fetch joins): ReuseExchange computes the shingle lineage
    * once whether or not the caller persisted, and the verify joins are
    * then already partitioned on their join key. Same
    * plan-not-cache-order reasoning as [[ngramJaccardPairsFrom]]'s
    * uncapped branch. */
  def dedupMinHashPairsFrom(
      withShingles: DataFrame, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    InputContracts.requireDeterministic(withShingles, "dedupMinHashPairsFrom")
    // the explicit isNotNull matters for plan reuse, not just semantics:
    // the verify inner joins push isnotnull(id) into their legs, and
    // without it here the signature leg's exchange subtree differs by
    // exactly that predicate — ReuseExchange can't unify them and the
    // corpus is scanned and shingled TWICE (plan-asserted in PlanSpec).
    // A null-id doc can never produce an output pair (every downstream
    // join is inner on the id), so filtering up front only stops such
    // docs from occupying capped-bucket slots.
    val base = withShingles.filter(col(idCol).isNotNull).repartition(
      withShingles.sparkSession.sessionState.conf.numShufflePartitions,
      col(idCol))
    val sigs = base.select(col(idCol),
        graft.functions.MinHashSig.minhashSig(col("sh"), numHashes).as("sig"))
      .select(col(idCol),
        explode(lshBands(col("sig"), numHashes, bands)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = bucketPairs(sigs, idCol, maxBucket)
    verifyJaccard(cands, base, idCol, threshold)
  }

  /** Exact Jaccard for candidate pairs: join each side's hashed shingle
    * ARRAY to the pair and intersect as a narrow map —
    * |A∩B| = size(array_intersect), |A∪B| = |A|+|B|-|A∩B|.
    *
    * This replaced an exploded co-occurrence count (pairs ⋈ index on id1,
    * ⋈ index on (id2, shingle), groupBy pair). Measured at sf1 (50 k docs,
    * 4.09 M candidates from the t=0.5 prefix filter, identical output):
    * full path 27.5–49.1 s exploded vs 7.5–18.1 s with array intersects —
    * candidate generation is then the entire cost and verification is
    * nearly free. The shape is also better at 100 TB: two equi-joins
    * keyed by doc id moving one ~8·|sh| byte array per side, instead of
    * |pairs|·|prefix-shared shingles| exploded rows through two shuffles
    * plus a pair-keyed aggregation. Doc arrays are bounded (shingle count
    * ≤ words), so per-row memory stays in the kilobytes. */
  def verifyJaccard(pairs: DataFrame, withShingles: DataFrame, idCol: String,
      threshold: Double, carry: Seq[String] = Nil): DataFrame = {
    val arr = withShingles.select(col(idCol), hashedSh(withShingles).as("__sha"))
    pairs
      .join(arr.select(col(idCol).as("id1"), col("__sha").as("__a1")), "id1")
      .join(arr.select(col(idCol).as("id2"), col("__sha").as("__a2")), "id2")
      .withColumn("__inter",
        size(array_intersect(col("__a1"), col("__a2"))).cast(LongType))
      .withColumn("__union",
        (size(col("__a1")) + size(col("__a2"))).cast(LongType) - col("__inter"))
      // Two EMPTY-shingle docs (caller-built arrays; shingleFrame never
      // emits them) have union 0, and Spark's ANSI mode throws
      // DIVIDE_BY_ZERO even for double division (empirically confirmed —
      // a plain pre-division filter is NOT enough, because predicate
      // pushdown can reorder it after the substituted jaccard predicate
      // and the division then evaluates first). The when() branch guards
      // the division structurally: zero-union pairs get NULL jaccard and
      // fall out of the threshold filter — the same drop-zero-union
      // contract the replaced inverted-index path enforced at its inner
      // join.
      .withColumn("jaccard", round(
        when(col("__union") > 0,
          col("__inter").cast(DoubleType) / col("__union").cast(DoubleType)), 4))
      .filter(col("jaccard") >= threshold)
      // the old path also never emitted ZERO-overlap pairs (no shared
      // shingle ⇒ no index co-occurrence); at threshold = 0.0 the
      // jaccard filter alone would now let them through — keep the
      // share-≥-1-shingle contract (a no-op whenever threshold > 0)
      .filter(col("__inter") > 0)
      .select(carry.map(col) ++ Seq(col("id1"), col("id2"), col("jaccard")): _*)
  }

  // ---- n-gram Jaccard (exact, complete) ---------------------------------

  /** Sentinel for `maxDocFreq`: no document-frequency cap at all. The
    * decision between "capped" and "uncapped" is made by COMPARING THE
    * ARGUMENT to this constant — zero Spark jobs at operator-construction
    * time (the previous design counted the corpus to prove a finite cap
    * was a no-op, a driver-blocking full pass a 100 TB pipeline would pay
    * per ingest batch). With NoCap the df aggregation, the cap join and
    * its persist are never built; with any finite cap they always run. */
  val NoCap: Int = Int.MaxValue

  /** Threshold at which [[ngramJaccardPairsFrom]] switches from the
    * single-shuffle co-occurrence plan to the AllPairs prefix-filter
    * plan (worth its extra shuffles only when the prefix is a small
    * fraction of each doc's shingles — see the branch comment). */
  val PrefixFilterThreshold: Double = 0.5

  /** True when this (threshold, maxDocFreq) combination routes to a
    * branch that reads the shingle frame from SEVERAL subtrees (prefix
    * filter, sizes, verification arrays) and therefore benefits from a
    * caller persist; the uncapped co-occurrence branch reads it exactly
    * once through its own exchange and a cache would be pure write
    * overhead. Shared by [[ngramJaccardPairs]]'s persist decision and
    * [[ngramJaccardPairsFrom]]'s dispatch so the two cannot desync if
    * the cutoff is ever tuned. */
  private[operators] def jaccardMultiConsumer(
      threshold: Double, maxDocFreq: Int): Boolean =
    threshold >= PrefixFilterThreshold || maxDocFreq != NoCap

  /** All pairs with Jaccard ≥ threshold, found exactly: candidates =
    * pairs sharing ≥1 shingle (the only pairs with jaccard > 0), via an
    * inverted-index equi-join on the shingle. `maxDocFreq` drops shingles
    * appearing in more docs than the cap — at threshold ≥ 0.3 a pair
    * sharing ONLY ultra-common shingles can't pass verification anyway
    * when each doc has > maxDocFreq/threshold distinct shingles. The
    * default is [[NoCap]] (exact); at 100 TB set a finite cap — an
    * uncapped hot shingle is a quadratic blowup in the candidate join. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.3, maxDocFreq: Int = NoCap): DataFrame = {
    val sh = shingleFrame(df, idCol, textCol, k)
    // the low-threshold uncapped branch reads the frame through exactly
    // one reused exchange (see ngramJaccardPairsFrom) — persisting it
    // there is pure cache-write overhead; every other branch reads it
    // from several subtrees (prefix filter, sizes, verification arrays)
    val withShingles =
      if (!jaccardMultiConsumer(threshold, maxDocFreq)) sh
      else OperatorCaches.track(sh.persist(StorageLevel.MEMORY_AND_DISK))
    ngramJaccardPairsFrom(withShingles, idCol, threshold, maxDocFreq)
  }

  /** [[ngramJaccardPairs]] restricted to pairs whose endpoints share an
    * equal (non-null) `groupCol` value — the "within-source" dedup report
    * shape (d10). Output is (groupCol, id1, id2, jaccard).
    *
    * Semantically identical to generating ALL pairs and filtering to
    * same-group afterwards (spec-pinned), but the restriction is pushed
    * INTO the candidate equi-join key (shingle, group): cross-group
    * co-occurrences never leave the join, never reach the pair-dedup
    * exchange, and never probe the verification joins — at G
    * uniformly-sized groups that is a ~G× cut of candidate volume (guide
    * §2.3/§2.4: drop rows before the exchange; 20 sources at sf0.1
    * measured 3.6 → 2.1 s warm on the t=0.5 pair gen, and d10 overall
    * 4.65 → 2.38 s). Also a skew lever at 100 TB: a hot
    * shingle's bucket splits across groups instead of one giant key.
    * Global document frequencies (prefix rarity order, df cap) are
    * unchanged — the per-doc prefix order must be one corpus-wide total
    * order for AllPairs' completeness, and keeping it global means the
    * candidate set is exactly "old candidates ∩ same-group". */
  def ngramJaccardPairsWithin(
      df: DataFrame, idCol: String, textCol: String, groupCol: String,
      k: Int = 3, threshold: Double = 0.3, maxDocFreq: Int = NoCap): DataFrame = {
    val sh = df.select(col(idCol), col(groupCol),
      graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh"))
    val withShingles =
      if (!jaccardMultiConsumer(threshold, maxDocFreq)) sh
      else OperatorCaches.track(sh.persist(StorageLevel.MEMORY_AND_DISK))
    ngramJaccardPairsFrom(withShingles, idCol, threshold, maxDocFreq,
      groupCol = Some(groupCol))
  }

  /** [[ngramJaccardPairs]] over a prepared [[shingleFrame]].
    *
    * Contract on caller-built frames: `sh` arrays must be DISTINCT per
    * doc (what [[shingleFrame]] emits) — `size(sh)` IS the
    * distinct-shingle count feeding every Jaccard denominator.
    * Construction is job-free: the capped-vs-uncapped choice compares
    * `maxDocFreq` to [[NoCap]], never the data (asserted by
    * PipelineOpsSpec's zero-jobs listener test). */
  def ngramJaccardPairsFrom(
      withShingles: DataFrame, idCol: String,
      threshold: Double = 0.3, maxDocFreq: Int = NoCap,
      groupCol: Option[String] = None): DataFrame = {
    InputContracts.requireDeterministic(withShingles, "ngramJaccardPairsFrom")
    // `groupCol` (set via ngramJaccardPairsWithin): the group column rides
    // the inverted index as a carry column and joins as an EXTRA EQUI-KEY
    // next to the shingle in every candidate join, so cross-group
    // candidates are dropped at the join instead of generated and
    // filtered. Document frequencies stay global (see Within's scaladoc).
    val gcols = groupCol.toSeq
    val inv = invFromShingles(withShingles, idCol,
      carry = gcols.map(g => g -> col(g)))
    val sizes = sizesFromShingles(withShingles, idCol)
    // global document frequencies: the prefix filter needs them for its
    // rarity order even uncapped; the cap filter applies only when a
    // finite cap is set (NoCap must not even compare __df against
    // Int.MaxValue — at 100 TB a df can exceed a 32-bit count)
    lazy val dfCountsAll = inv.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
    lazy val dfCounts =
      if (maxDocFreq == NoCap) dfCountsAll
      else dfCountsAll.filter(col("__df") <= maxDocFreq)
    if (threshold >= PrefixFilterThreshold) {
      // AllPairs prefix filter (Bayardo et al.): order each doc's
      // shingles by GLOBAL rarity; a pair with jaccard >= t must share
      // an element within the first |x| - ceil(t*|x|) + 1 shingles of
      // BOTH docs (any consistent total order). Lossless; worth the two
      // extra shuffles only when t is high enough that the prefix is a
      // small fraction (t=0.7 -> 30% of shingles; t=0.1 -> 90%, useless).
      // the prefix length and the size-ratio prune below both derive
      // from the admission rule round(J, 4) >= t, which admits true J
      // down to t - 0.00005 — slacken the threshold constant by that
      // rounding granularity (plus a relative 1e-12 for fl()'s own
      // rounding) so round-boundary pairs below true-J t are never
      // pruned before exact verification
      val slackedT = (threshold - 0.00005) * (1.0 - 1e-12)
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col(idCol)).orderBy(col("__df").asc, col("shingle").asc)
      val prefix = inv.join(dfCounts, Seq("shingle"))
        .withColumn("__rk", row_number().over(wDoc))
        .join(sizes, Seq(idCol))
        .filter(col("__rk") <= col("sz") - ceil(lit(slackedT) * col("sz")) + 1)
        .select(Seq(col("shingle"), col(idCol), col("sz"), col("__rk")) ++
          gcols.map(col): _*)
      // size-ratio bound (AllPairs companion filter): J(A,B) ≤
      // min(|A|,|B|)/max(|A|,|B|), so a pair whose sizes differ by more
      // than 1/t cannot reach the threshold — prune it INSIDE the
      // self-join, before the candidate shuffle and the array-fetch
      // verification joins ever see it. Uses the same slacked threshold
      // as the prefix bound above; over-keeping is harmless — every
      // candidate is exact-verified.
      //
      // Positional filter (PPJoin, Xiao et al. WWW'08), applied PER JOIN
      // ROW, before the pair-dedup shuffle: each matched prefix shingle
      // carries its positions (pA, pB), and because the per-doc order is
      // the restriction of one global total order (df asc, shingle asc),
      // every shared shingle of the pair ranks at or after the earliest
      // match in BOTH docs — so the overlap is at most
      // 1 + min(|A| - pA, |B| - pB), and J ≥ t needs overlap ≥
      // t/(1+t)·(|A|+|B|). The bound is decreasing in the positions, so
      // a pair's earliest-match row carries its LARGEST bound: filtering
      // rows by their own bound admits a pair iff the aggregated
      // earliest-match bound admits it (identical, lossless admission),
      // while dropping the failing rows before the distinct's map-side
      // combine and shuffle — and the surviving candidates never
      // generate the two verification joins' probe rows (3.10 M → 1.25 M
      // at sf1 t=0.5). The bound uses slackedT, so round-boundary pairs
      // are over-kept (exact verification follows), and it stays valid
      // under a finite df cap — capped-out shingles all rank AFTER every
      // surviving shingle in the global order, so `sz − pos` (full size,
      // survivor position) upper-bounds the tokens remaining after the
      // match on each side.
      val minOverlapFrac = slackedT / (1.0 + slackedT)
      val cands = prefix.select(Seq(col("shingle"), col(idCol).as("id1"),
          col("sz").as("__s1"), col("__rk").as("__p1")) ++ gcols.map(col): _*)
        .join(prefix.select(Seq(col("shingle"), col(idCol).as("id2"),
            col("sz").as("__s2"), col("__rk").as("__p2")) ++ gcols.map(col): _*),
          "shingle" +: gcols)
        .filter(col("id1") < col("id2") &&
          least(col("__s1"), col("__s2")).cast(DoubleType) >=
            lit(slackedT) * greatest(col("__s1"), col("__s2")).cast(DoubleType) &&
          lit(1.0) +
            least(col("__s1") - col("__p1"), col("__s2") - col("__p2"))
              .cast(DoubleType) >=
            lit(minOverlapFrac) * (col("__s1") + col("__s2")).cast(DoubleType))
        .select(gcols.map(col) ++ Seq(col("id1"), col("id2")): _*)
        .distinct()
      verifyJaccard(cands, withShingles, idCol, threshold, carry = gcols)
    } else if (maxDocFreq == NoCap) {
      // low threshold, uncapped: one shuffle — co-occurrence counts ARE
      // the intersection sizes; no distinct pass, no verification join.
      // The WHOLE computation derives from ONE explicit exchange: the
      // repartition below is the single place the shingle lineage is
      // computed, Catalyst's ReuseExchange hands its output to both
      // self-join legs (already co-partitioned, so the join adds no
      // further shuffle), and each index row carries its doc's
      // distinct-gram count — attached narrowly at explode time, +8
      // bytes per row through the shuffle — so the Jaccard denominators
      // ride the join instead of costing two size-aggregation passes
      // and two joins afterwards. This makes single-computation a
      // property of the PLAN, not of cache-materialization order: the
      // r10 design relied on the eager count() incidentally filling the
      // caller's persisted frame before the join legs raced to
      // first-fill it — removing the count in r11 sent sf1 d04 from 5.2
      // to 13.5 s (every leg recomputed the corpus shingling); the
      // reused-exchange + inline-size plan runs 4.6 s with zero jobs at
      // construction and no reliance on the caller persisting anything.
      val indexed = invFromShingles(withShingles, idCol,
        carry = Seq("sz" -> size(col("sh")).cast(LongType)) ++
          gcols.map(g => g -> col(g)))
      // explicit partition count: AQE coalesces a bare repartition(col)
      // to the ~64 MB advisory target, which at sf1 collapses the join's
      // sort parallelism to a handful of tasks; an explicit N is exempt
      // from coalescing and keeps the sorts as wide as the session's
      // shuffle parallelism
      val shufflePartitions =
        withShingles.sparkSession.sessionState.conf.numShufflePartitions
      val part = indexed.repartition(shufflePartitions, col("shingle"))
      // size-ratio prune between join and aggregation (same whole-stage
      // codegen): J ≤ min/max of the sizes, so rows whose pair cannot
      // reach the slacked threshold skip the partial-agg hash map.
      // Lossless — the pruned pairs would fail the jaccard filter below.
      val coSlackedT = (threshold - 0.00005) * (1.0 - 1e-12)
      // with groupCol: the extra equi-key is satisfied by the existing
      // shingle partitioning (a subset of the join keys), so the plan
      // keeps its single reused exchange — cross-group co-occurrences
      // are dropped inside the join instead of counted and discarded
      part.select(Seq(col("shingle"), col(idCol).as("id1"),
          col("sz").as("__sz1")) ++ gcols.map(col): _*)
        .join(part.select(Seq(col("shingle"), col(idCol).as("id2"),
            col("sz").as("__sz2")) ++ gcols.map(col): _*),
          "shingle" +: gcols)
        .filter(col("id1") < col("id2") &&
          least(col("__sz1"), col("__sz2")).cast(DoubleType) >=
            lit(coSlackedT) * greatest(col("__sz1"), col("__sz2")).cast(DoubleType))
        .groupBy(gcols.map(col) ++ Seq(col("id1"), col("id2")): _*)
        // sz is constant within a pair group — first() just carries it
        .agg(count(lit(1)).as("__inter"),
          first(col("__sz1")).as("__sz1"), first(col("__sz2")).as("__sz2"))
        .withColumn("jaccard", round(
          col("__inter").cast(DoubleType) /
          (col("__sz1") + col("__sz2") - col("__inter")).cast(DoubleType), 4))
        .filter(col("jaccard") >= threshold)
        .select(gcols.map(col) ++
          Seq(col("id1"), col("id2"), col("jaccard")): _*)
    } else {
      // low threshold with a finite cap: the capped index is a JOIN
      // (filter against the df aggregation), so it persists — both
      // self-join legs read the materialized result rather than running
      // the aggregation + join twice (measured ~25% of d09's wall time
      // at sf0.1 when it ran twice)
      val capped = OperatorCaches.track(
        inv.join(dfCounts.select(col("shingle")), Seq("shingle"))
          .persist(StorageLevel.MEMORY_AND_DISK))
      val inter = capped.select(Seq(col("shingle"), col(idCol).as("id1")) ++
          gcols.map(col): _*)
        .join(capped.select(Seq(col("shingle"), col(idCol).as("id2")) ++
            gcols.map(col): _*),
          "shingle" +: gcols)
        .filter(col("id1") < col("id2"))
        .groupBy(gcols.map(col) ++ Seq(col("id1"), col("id2")): _*)
        .agg(count(lit(1)).as("__inter"))
      jaccardFromCounts(inter, sizes, idCol, threshold, carry = gcols)
    }
  }

  /** Shared finisher for the count-based paths: (id1, id2, __inter)
    * co-occurrence counts → (id1, id2, jaccard ≥ threshold). A pair can
    * only reach here by sharing ≥ 1 shingle, so the union is never zero. */
  private def jaccardFromCounts(inter: DataFrame, sizes: DataFrame,
      idCol: String, threshold: Double, carry: Seq[String] = Nil): DataFrame =
    inter
      .join(sizes.select(col(idCol).as("id1"), col("sz").as("__sz1")), "id1")
      .join(sizes.select(col(idCol).as("id2"), col("sz").as("__sz2")), "id2")
      .withColumn("jaccard", round(
        col("__inter").cast(DoubleType) /
        (col("__sz1") + col("__sz2") - col("__inter")).cast(DoubleType), 4))
      .filter(col("jaccard") >= threshold)
      .select(carry.map(col) ++
        Seq(col("id1"), col("id2"), col("jaccard")): _*)

  // ---- SimHash ----------------------------------------------------------

  /** SimHash near-dup pairs: fused 64-bit fingerprint, candidates via the
    * pigeonhole banding (4 × 16-bit chunks: hamming ≤ 3 ⇒ ≥ 1 equal
    * chunk), verified with bit_count(xor) ≤ maxHamming. Same
    * single-shuffle capped-collector shape as [[bucketPairs]]; the
    * fingerprint is one long, so it rides the candidate shuffle. */
  def dedupSimHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000,
      nRows: Option[Long] = None): DataFrame = {
    // r13 verdict #2: 4×16-bit bands = 65,536 buckets/band FOREVER, the
    // same fixed-bucket-space structure the r13 d06 fix removed. Beyond
    // [[simHashSaturationDocs]] the expected occupancy exceeds the
    // collector cap and the saturated-bucket filter silently drops real
    // candidates (spec-pinned at a synthetic over-occupancy bucket).
    // Fail fast when the caller states the corpus size; construction
    // stays job-free, so an unstated size cannot be checked here —
    // the bound is documented on both operators.
    nRows.foreach { n =>
      require(n <= simHashSaturationDocs(maxBucket),
        s"dedupSimHashPairs: n=$n exceeds the 64-bit fingerprint's " +
        s"band-space saturation bound (${simHashSaturationDocs(maxBucket)} " +
        s"docs at maxBucket=$maxBucket) — expected bucket occupancy " +
        "n/2^16 passes the collector cap and real candidate pairs would " +
        "be silently dropped. Use dedupSimHashPairsWide (128-bit " +
        "fingerprint, occupancy-sized bands).")
    }
    val sigs = df.select(col(idCol), simhash64Sig(col(textCol)).as("sig"))
    val chunked = simhash64Chunks(sigs, "sig")
    val cappedPairs = udaf(new graft.functions.CappedCollector[(Long, Long)](maxBucket))
    chunked.groupBy(col("band"), col("bucket"))
      .agg(cappedPairs(col(idCol), col("sig")).as("__xs"))
      .filter(size(col("__xs")).between(2, maxBucket))
      .select(sort_array(col("__xs")).as("__xs"))
      .select(col("__xs"), posexplode(col("__xs")).as(Seq("__i", "__a")))
      .select(col("__a"),
        explode(slice(col("__xs"), col("__i") + lit(2), size(col("__xs")))).as("__b"))
      .select(col("__a._1").as("id1"), col("__b._1").as("id2"),
        bit_count(col("__a._2").bitwiseXOR(col("__b._2"))).as("hamming"))
      .filter(col("id1") < col("id2")) // no self-pairs from duplicate ids
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The 64-bit fingerprint of tokenized text — ONE definition shared by
    * the full and incremental SimHash operators, so their "identical
    * banding ⇒ incremental == full-restricted" adoption contract is
    * enforced by construction, not only by the equivalence specs. */
  private[operators] def simhash64Sig(text: Column): Column =
    SimHash64.simhash64(graft.functions.TokenizeWords.tokenizeWords(text))

  /** The fixed 4×16-bit chunk explode over a frame carrying `sigCol`:
    * appends (band, bucket) — one output row per chunk — keeping every
    * input column. Shared band derivation of [[dedupSimHashPairs]] and
    * [[simHashIncremental]] (same contract note as [[simhash64Sig]]). */
  private[operators] def simhash64Chunks(sigs: DataFrame, sigCol: String): DataFrame = {
    val chunks = array((0 until 4).map { c =>
      struct(lit(c).as("band"),
        shiftright(col(sigCol), c * 16).bitwiseAND(lit(0xffffL)).as("bucket"))
    }: _*)
    sigs.withColumn("bb", explode(chunks))
      .select(sigs.columns.map(col) :+ col("bb.band").as("band") :+
        col("bb.bucket").as("bucket"): _*)
  }

  /** Corpus size at which [[dedupSimHashPairs]]'s fixed 16-bit band
    * space saturates: expected bucket occupancy n/2^16 reaches
    * `maxBucket`, past which the capped collector's saturated-bucket
    * filter drops real candidates silently (~6.5×10⁸ docs at the
    * default cap). */
  def simHashSaturationDocs(maxBucket: Int = 10000): Long =
    maxBucket.toLong << 16

  /** (bands, bandBits) for [[dedupSimHashPairsWide]]: bandBits from the
    * r13 occupancy rule (buckets/band = 2^bandBits tracks
    * n/targetOccupancy, clamped to [16, 32]); bands = every
    * non-overlapping bandBits-wide slice the two 64-bit words hold
    * (2·⌊64/bandBits⌋: 8 at 16 bits, 6 at 17–21, 4 at 22–32). The trade
    * is explicit and monotone: more docs → wider buckets (cost/
    * saturation: bound grows to maxBucket·2^32 ≈ 4×10¹³ docs) → fewer
    * bands, so the pigeonhole guarantee "hamming ≤ bands−1 ⇒ found"
    * narrows 7→3 while recall beyond it stays probabilistic. */
  def simHashBandsFor(nRows: Long, targetOccupancy: Int = 32): (Int, Int) = {
    require(targetOccupancy >= 2, s"targetOccupancy too small: $targetOccupancy")
    val bits = math.min(32, math.max(16, math.ceil(
      math.log(math.max(2.0, nRows.toDouble / targetOccupancy)) /
        math.log(2.0)).toInt))
    (2 * (64 / bits), bits)
  }

  /** SimHash near-dup pairs over a 128-bit fingerprint
    * ([[graft.functions.SimHash128]]) — the scale tier of
    * [[dedupSimHashPairs]] for corpora past [[simHashSaturationDocs]]
    * (~6.5×10⁸ docs), where the 64-bit form's fixed 65,536-bucket bands
    * saturate the collector cap. Bands are sized to the stated corpus
    * size by [[simHashBandsFor]]; `maxHamming` is measured on 128 bits
    * (≈ double the 64-bit radius for the same similarity). Same
    * single-candidate-shuffle shape as the cosine path: the narrow
    * (id, sig) frame is computed BEFORE one id-keyed exchange that all
    * three consumers (band explode + both verify joins) reuse, and only
    * (id, band, bucket) rows fan out per band. */
  def dedupSimHashPairsWide(
      df: DataFrame, idCol: String, textCol: String, nRows: Long,
      maxHamming: Int = 16, targetOccupancy: Int = 32,
      maxBucket: Int = 10000): DataFrame = {
    InputContracts.requireDeterministic(df, "dedupSimHashPairsWide")
    val (bands, bits) = simHashBandsFor(nRows, targetOccupancy)
    val perWord = bands / 2
    val mask = (1L << bits) - 1
    // Operator shuffle width from expected CANDIDATE volume, same rule
    // as cosineNearDupLSHBanded (r14 review pass): this operator exists
    // for corpora past ~6.5×10⁸ docs, where bands·n·occupancy/2 pair
    // rows at the session's corpus-sized width is exactly the sort-spill
    // failure the cosine path's wide mode prevents. ~2M pair-rows/task;
    // one width for the whole operator so the reused exchange survives.
    val sessParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val expectedCandidates =
      bands.toDouble * nRows * (nRows.toDouble / (1L << bits)) / 2
    val want = math.ceil(expectedCandidates / 2e6).toInt
    val wide = want > sessParts
    val width = if (wide) math.min(32768, want) else sessParts
    // sig computed BEFORE the exchange: every consumer needs exactly
    // (id, sig), so the exchange carries 16 bytes/doc (not the text) and
    // column pruning can't specialize the subtrees apart
    val sigs = df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        graft.functions.SimHash128.simhash128(
          graft.functions.TokenizeWords.tokenizeWords(col(textCol))).as("sig"))
      .repartition(width, col(idCol))
    val exploded = sigs.select(col(idCol),
      explode(array((0 until bands).map { b =>
        val w = b / perWord
        val j = b % perWord
        struct(lit(b).as("band"),
          shiftright(element_at(col("sig"), w + 1), j * bits)
            .bitwiseAND(lit(mask)).as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = bucketPairs(exploded, idCol, maxBucket,
      if (wide) width else 0)
    cands
      .join(sigs.select(col(idCol).as("id1"), col("sig").as("s1")), "id1")
      .join(sigs.select(col(idCol).as("id2"), col("sig").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        (bit_count(element_at(col("s1"), 1).bitwiseXOR(element_at(col("s2"), 1))) +
         bit_count(element_at(col("s1"), 2).bitwiseXOR(element_at(col("s2"), 2))))
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine near-dup ----------------------------------------

  /** Exact cosine near-dup pairs ≥ threshold. Exact variant: block the
    * cross product by random-hyperplane sign buckets would be approximate;
    * the exact path is a (small-side broadcast) self-join — use only when
    * one side fits in memory, else use [[Similarity.hyperplaneBuckets]]
    * candidates + verify. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      Similarity.norm(col(vecCol)).as("n1"))
    val w = df.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      Similarity.norm(col(vecCol)).as("n2"))
    v.join(w, col("id1") < col("id2"))
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** Bucket-count sizing for [[cosineNearDupLSH]] (r13): with FIXED
    * planes the per-band bucket count is constant, so candidate pairs
    * grow as n²/2^rowsPerBand — quadratic in corpus size. The r13 sf3
    * sweep measured exactly that: 3× vectors → 16.5× runtime at the old
    * fixed planes=32/bands=4 (256 buckets/band). Holding bucket
    * OCCUPANCY constant instead makes verify cost ~n·occupancy·bands/2 —
    * linear in n. Returns planes = bands × rowsPerBand with
    * rowsPerBand = clamp(log2(n/targetOccupancy), 4, 63/bands).
    *
    * The explicit trade (callers pick per corpus): growing bits holds
    * COST constant but lowers per-band recall (P(band match) =
    * p^rowsPerBand, p = 1 − θ/π); growing BANDS holds recall and costs
    * linearly. One 64-bit signature long caps bands × rowsPerBand at
    * 63 — beyond ~2^16 buckets/band at 4 bands, add bands in a second
    * signature word rather than bits. */
  def hyperplanePlanesFor(nRows: Long, bands: Int,
      targetOccupancy: Int = 32): Int = {
    require(bands >= 1 && bands <= 15, s"bands out of range: $bands")
    val needed = math.ceil(
      math.log(math.max(2.0, nRows.toDouble / targetOccupancy)) /
        math.log(2.0)).toInt
    val rowsPerBand = math.max(4, math.min(63 / bands, needed))
    // r13 ADVICE: past ~targetOccupancy·2^(63/bands) rows the one-long
    // budget clamps rowsPerBand and occupancy — hence candidate volume —
    // silently goes quadratic again. Signal it: the banded sizer below
    // has no shared budget and is the scale path.
    if (needed > 63 / bands) log.warn(
      s"hyperplanePlanesFor: rowsPerBand clamped to ${63 / bands} (needed " +
      s"$needed) by the one-long signature at n=$nRows, bands=$bands — " +
      "bucket occupancy now grows with n. Use hyperplaneLshParamsFor + " +
      "cosineNearDupLSHBanded (per-band longs, no shared bit budget).")
    bands * rowsPerBand
  }

  /** Parameters for [[cosineNearDupLSHBanded]], sized by
    * [[hyperplaneLshParamsFor]]. `predictedRecall` is the model's
    * probability that a pair AT the threshold boundary shares ≥1 band;
    * `clamped` is true when the recall floor was unreachable within
    * `maxBands` (the sizer warns and returns its best effort — the
    * honest flag r13's one-long clamp lacked). */
  case class HyperplaneLshParams(bands: Int, rowsPerBand: Int,
      predictedRecall: Double, clamped: Boolean, nRows: Long = 0L) {
    /** Total hyperplanes drawn: each band has its own independent set. */
    def planes: Int = bands * rowsPerBand

    /** Uniform-model candidate-pair estimate: bands · n · occupancy/2
      * with occupancy = n/2^rowsPerBand. The sizing input for shuffle
      * width (intermediate volume, NOT input size); 0 when nRows is
      * unknown. graft.LshProbe measures the ground truth (sum of
      * C(occ,2) over real buckets) — on the shipped corpora the model
      * is within ~1.4× of it. */
    def expectedCandidates: Double =
      if (nRows <= 0) 0.0
      else bands.toDouble * nRows * (nRows.toDouble / (1L << rowsPerBand)) / 2
  }

  /** Joint (bands, rowsPerBand) sizing holding BOTH the r13 occupancy
    * rule (cost) and a recall floor at the threshold boundary (quality —
    * the r13 verdict's `weak`: growing band BITS alone held cost linear
    * but dropped boundary recall 23%→2.5%→0.4% as n went 2k→60k→10⁹).
    *
    *  - rowsPerBand = log₂(n / targetOccupancy): buckets per band track
    *    n, so per-band candidate volume stays ~n·occupancy/2 — the cost
    *    lever, unchanged from r13.
    *  - bands from the floor: a boundary pair (cosine = θ) agrees with
    *    one plane w.p. p = 1 − arccos(θ)/π, with a whole band w.p.
    *    p^rowsPerBand, so bands ≥ ln(1−floor)/ln(1−p^rowsPerBand) —
    *    the recall lever, new in r14. Each band carries its own long
    *    ([[graft.functions.HyperplaneBandBuckets]]), so there is no
    *    63-bit budget forcing the r13 trade.
    *
    * The cost law this buys (measured in PERF.md round-14): bands grow
    * like n^ρ with ρ = ln(1/p)/ln 2, so total candidate volume is
    * n^(1+ρ) — θ=0.9 → n^1.22 (≈linear), θ=0.7 → n^1.43, θ=0.4 →
    * n^1.66. Guaranteed-recall LSH at a LOW boundary is intrinsically
    * super-linear (the classic n^(1+ρ) bound); the caller picks the
    * (threshold, floor, maxBands) point per corpus, and `clamped` says
    * when the floor didn't fit the cost cap. */
  def hyperplaneLshParamsFor(nRows: Long, threshold: Double,
      recallFloor: Double = 0.95, targetOccupancy: Int = 32,
      maxBands: Int = 4096): HyperplaneLshParams = {
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0,1): $threshold")
    require(recallFloor > 0.0 && recallFloor < 1.0,
      s"recallFloor must be in (0,1): $recallFloor")
    require(targetOccupancy >= 2, s"targetOccupancy too small: $targetOccupancy")
    require(maxBands >= 2, s"maxBands too small: $maxBands")
    val p = 1.0 - math.acos(threshold) / math.Pi
    val rowsPerBand = math.min(62, math.max(4, math.ceil(
      math.log(math.max(2.0, nRows.toDouble / targetOccupancy)) /
        math.log(2.0)).toInt))
    val pBand = math.pow(p, rowsPerBand)
    // 1−(1−pBand)^b ≥ floor  ⇔  b ≥ ln(1−floor)/ln(1−pBand); +Inf when
    // pBand underflows to 0 (negative/−0.0), caught by the !(≤) test
    val needed = math.log1p(-recallFloor) / math.log1p(-pBand)
    val bands =
      if (!(needed <= maxBands)) maxBands
      else math.max(2, math.ceil(needed).toInt)
    val predicted = 1.0 - math.pow(1.0 - pBand, bands.toDouble)
    val clamped = predicted < recallFloor
    if (clamped) log.warn(f"hyperplaneLshParamsFor: recall floor " +
      f"$recallFloor%.2f at threshold $threshold%.2f unreachable within " +
      f"maxBands=$maxBands for n=$nRows (needs ${math.ceil(needed)}%.0f " +
      f"bands; predicted recall $predicted%.4f). Raise maxBands (cost " +
      "grows linearly in bands) or raise the threshold.")
    HyperplaneLshParams(bands, rowsPerBand, predicted, clamped, nRows)
  }

  /** LSH-bucketed (approximate) cosine near-dup: random-hyperplane sign
    * bands generate candidates, exact cosine verifies. The scale path:
    * only (id, band, bucket) rows enter the candidate shuffle
    * ([[bucketPairs]], single capped aggregation) — the embedding
    * vectors are heavy per row and join back by id ONLY for the
    * surviving candidate pairs. At 100 TB this keeps the wide payload
    * out of the one shuffle that fans out per band. Size `planes` to the
    * corpus via [[hyperplanePlanesFor]] — fixed planes are quadratic in
    * n (see its doc). */
  def cosineNearDupLSH(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, planes: Int = 16, bands: Int = 4,
      seed: Long = 7L, maxBucket: Int = 10000): DataFrame = {
    InputContracts.requireDeterministic(df, "cosineNearDupLSH")
    // fused signature (one long, native pass — the composed per-plane
    // expression tree exceeded codegen limits); the frame reaches its
    // three consumers (band explode + both verify joins) through one
    // id-keyed reused exchange instead of a persisted cache whose
    // first-fill the consumers would race (same plan-not-cache-order
    // reasoning as dedupMinHashPairsFrom; r11 sf1 A/B: 4.7 → 4.0 s
    // median-of-5, warm reps ~3.7)
    val rowsPerBand = planes / bands
    val mask = (1L << rowsPerBand) - 1
    // ReuseExchange needs the band-explode leg and both verify joins to
    // present the IDENTICAL exchange subtree, which takes two measures
    // (both plan-asserted in PlanSpec): the explicit isNotNull (the
    // verify inner joins push isnotnull(id) into their legs — same as
    // dedupMinHashPairsFrom), and computing the signature AFTER the
    // exchange (were hsig below it, column pruning would specialize the
    // band leg to (id, hsig) and the verify legs to (id, vec) — two
    // different subtrees, vectors scanned twice). The vector crosses the
    // one shared exchange anyway for verification; the signature is a
    // narrow post-exchange map on the band leg only.
    val base = df.filter(col(idCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col(idCol))
    val withSig = base.select(col(idCol),
      graft.functions.HyperplaneSig.sig(col(vecCol), dim, planes, seed).as("hsig"))
    val exploded = withSig.select(col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("hsig"), b * rowsPerBand).bitwiseAND(lit(mask)).as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = bucketPairs(exploded, idCol, maxBucket)
    cands
      .join(base.select(col(idCol).as("id1"), col(vecCol).as("v1")), "id1")
      .join(base.select(col(idCol).as("id2"), col(vecCol).as("v2")), "id2")
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) /
        (Similarity.norm(col("v1")) * Similarity.norm(col("v2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** [[cosineNearDupLSH]] with jointly-sized banding
    * ([[hyperplaneLshParamsFor]]): the signature is array<long> — one
    * long PER BAND ([[graft.functions.HyperplaneBandBuckets]]) — so
    * bands can grow with n to hold the recall floor while rowsPerBand
    * grows to hold bucket occupancy; neither steals bits from the other
    * (the r13 one-long clamp that silently traded recall for cost).
    * Identical distributed shape to [[cosineNearDupLSH]]: only
    * (id, band, bucket) rows enter the one candidate shuffle, vectors
    * re-join by id for verification of surviving pairs, and the base
    * frame reaches its three consumers through one reused id-keyed
    * exchange (same isNotNull + signature-after-exchange measures,
    * plan-asserted in PlanSpec). */
  def cosineNearDupLSHBanded(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, params: HyperplaneLshParams,
      seed: Long = 7L, maxBucket: Int = 10000): DataFrame = {
    InputContracts.requireDeterministic(df, "cosineNearDupLSHBanded")
    // OPERATOR shuffle width from EXPECTED PAIR volume (~2M pair-rows ≈
    // 32 MB unsafe rows per task), never below the session width: a
    // recall-first sizing can emit 10⁴× more pairs than input rows, and
    // corpus-sized partitions sort-spilled a 75 GB disk to death at sf3
    // (582M pairs / 32 partitions — PERF.md round-14). At cluster scale
    // this is the difference between "the plan says 200 partitions
    // because the CORPUS needed 200" and "the pair stream needs 300k".
    // ONE width for the whole operator — the base exchange, the
    // candidate stages, and (by EnsureRequirements aligning to the
    // satisfied side) both verify joins — so the single-scan/
    // reused-exchange contract survives wide mode (plan-asserted in
    // PlanSpec for both modes). When the width fits the session value
    // the plan is byte-identical to before, map-side partial
    // aggregation included; at many-bands sizings partial agg
    // compresses ~nothing anyway (buckets-per-mapper ≈ rows-per-mapper).
    val sessParts = df.sparkSession.sessionState.conf.numShufflePartitions
    val want = math.ceil(params.expectedCandidates / 2e6).toInt
    val wide = params.expectedCandidates > 0 && want > sessParts
    val width = if (wide) math.min(32768, want) else sessParts
    // vec null-filter joins the id one in the SHARED subtree: a null
    // vector can never verify (null cosine fails every threshold), and
    // filtering it here keeps it out of capped-bucket slots
    val base = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol))
      .repartition(width, col(idCol))
    // signature computed AFTER the exchange (column pruning would
    // otherwise specialize the band leg's subtree and break reuse —
    // see cosineNearDupLSH); posexplode's position IS the band id.
    // The OUTER variant matters for the same reason: plain posexplode
    // makes InferFiltersFromGenerate push a signature-referencing
    // size>0 filter below the band leg's exchange, splitting its
    // subtree from the verify legs' (corpus scanned and signed twice —
    // caught by the wide-mode PlanSpec assert). The signature array is
    // never null/empty here (bands ≥ 1, vectors pre-filtered non-null),
    // so OUTER changes nothing semantically.
    val exploded = base.select(col(idCol),
        graft.functions.HyperplaneSig.bandBuckets(col(vecCol), dim,
          params.bands, params.rowsPerBand, seed).as("hbb"))
      .select(col(idCol), posexplode_outer(col("hbb")).as(Seq("band", "bucket")))
    val cands = bucketPairs(exploded, idCol, maxBucket,
      if (wide) width else 0)
    cands
      .join(base.select(col(idCol).as("id1"), col(vecCol).as("v1")), "id1")
      .join(base.select(col(idCol).as("id2"), col(vecCol).as("v2")), "id2")
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) /
        (Similarity.norm(col("v1")) * Similarity.norm(col("v2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  // ---- dedup-group resolution -------------------------------------------

  /** Connected components over a near-dup pair list — the step that turns
    * pairwise matches into dedup GROUPS (pick one canonical doc per
    * component, drop the rest). Classic min-label propagation: every node
    * starts as its own component; each round pushes labels across edges
    * and keeps the per-node minimum; fixpoint when no label changes.
    *
    * Scale notes: state is ONE (node, component) row per node — never the
    * transitive closure (which is quadratic on dense clusters). Each round
    * is an equi-join (edges ⋈ labels) + a min-aggregation, both plain
    * shuffles on the node key; `localCheckpoint` truncates per-round
    * lineage. Rounds needed = graph diameter; near-dup clusters are
    * shallow (docs similar to a common template are all pairwise linked,
    * diameter ≤ ~2), which is why plain propagation beats the more complex
    * large-star/small-star variant here. Returns (node, component) with
    * component = min node id reachable. */
  /** Size-aware width for [[connectedComponents]]'s single edge-list
    * exchange (r17 verdict #1): one partition per ~128k edge rows,
    * floored at 1 (toy graphs run 1-task fixpoint rounds instead of
    * paying sessParts tasks of scheduler overhead per round), capped at
    * the session width (at-scale edge lists keep full parallelism). */
  def edgeWidth(nEdgeRows: Long, sessParts: Int): Int =
    math.max(1L, math.min(sessParts.toLong, nEdgeRows / 131072L + 1L)).toInt

  /** The pre-checkpoint edge-build plan (exposed so plan dumps and specs
    * can pin the one-exchange shape — the committed d07 after-plan only
    * shows the final checkpointed frame because the fixpoint runs at
    * plan-build time, r17 verdict #8). */
  private[graft] def edgeBuild(raw: DataFrame, width: Int): DataFrame =
    raw.repartition(width, col("src")).dropDuplicates("src", "dst")

  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    // pairs is read by BOTH union legs below before the checkpoint
    // materializes anything — a random pair list would seed asymmetric
    // edges
    InputContracts.requireDeterministic(pairs, "connectedComponents")
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // Materialize the raw (un-deduped) edge list BEFORE the keyed
    // exchange: the union's two legs each re-run the pair generator's
    // post-exchange work (the verify join + similarity compute) when
    // they live in one lineage — checkpointing the union first runs
    // pair generation once, and gives an exact edge count for free.
    val raw = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // edges checkpoint AFTER a hash-repartition on the join key: the
    // checkpointed LogicalRDD keeps its outputPartitioning, so the
    // per-round join re-shuffles only the (much smaller) label frame.
    // r17 (guide §2.4): dedup AFTER the src repartition instead of a
    // standalone distinct() before it — HashPartitioning(src) satisfies
    // the (src, dst) aggregation's clustering requirement (subset rule),
    // so dropDuplicates adds NO exchange and the edge list crosses the
    // network once, not twice; the aggregate preserves the src
    // partitioning the rounds rely on. Same rows (set semantics), and
    // duplicates never affected correctness anyway (per-round min() is
    // duplicate-insensitive) — the dedup is a per-round cost saver.
    // r18 (r17 verdict #1): the repartition width is SIZE-AWARE, not the
    // session constant — pinning a 260-edge sf0.1 graph to 32 partitions
    // forfeited AQE coalescing and charged every fixpoint round ~32
    // tasks of scheduler overhead per join/agg/checkpoint (driver bench
    // 2.19→3.88 s, 8 cores beating 32 at 0.51×). Width = exact edge
    // count (from the checkpoint above, no extra pass) over a ~128k
    // rows/partition target, floored at 1 and capped at the session
    // width, so toy graphs run 1-task rounds while at-scale edge lists
    // keep the full session width — and still exactly ONE network pass
    // of the edge list either way.
    val sessParts = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // release `raw` whether or not the count/dedup jobs succeed — the
    // deduped checkpoint reads its own blocks from here on
    val edges = try {
      edgeBuild(raw, edgeWidth(raw.count(), sessParts)).localCheckpoint()
    } finally OperatorCaches.releaseCheckpoint(raw)
    // seed labels with min(node, min neighbor): the same groupBy-on-src
    // shuffle the plain distinct() would pay, but it bakes the first
    // propagation round into initialization — one fewer loop iteration
    // (checkpoint + convergence job) for any graph
    var labels = edges.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("__m"))
      .select(col("node"), least(col("node"), col("__m")).as("component"))
      .localCheckpoint()
    // the frame whose checkpoint blocks back the current `labels` — each
    // round's eager checkpoint fully materializes the next one, so the
    // superseded round's blocks release immediately instead of leaking
    // one persisted RDD per round until driver GC
    var ckpt = labels
    var converged = false
    var rounds = 0
    // Any exit before the happy path — a mid-round job failure or the
    // no-fixpoint throw below — must still release the edges checkpoint
    // and the last round's label checkpoint, or their block-manager
    // storage leaks until a blanket getPersistentRDDs unpersist.
    try {
      while (!converged && rounds < maxIter) {
        // Messages pre-aggregate to one candidate per receiving node before
        // touching the label frame, and the previous label rides along so
        // ONE checkpointed job per round yields both the new labels and the
        // convergence evidence (the earlier form re-joined next against the
        // old labels — a second full shuffle job per round).
        val pushed = edges
          .join(labels.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("node")).agg(min("component").as("__pushed"))
        val next = labels.join(pushed, Seq("node"), "left")
          .select(col("node"),
            least(col("component"), col("__pushed")).as("component"),
            col("component").as("__prev"))
          .localCheckpoint()
        // hand over ckpt -> next BEFORE the convergence job, so the catch
        // below always sees the newest materialized checkpoint in `ckpt`
        OperatorCaches.releaseCheckpoint(ckpt)
        ckpt = next
        labels = next.select(col("node"), col("component"))
        converged = next.filter(col("component") < col("__prev")).isEmpty
        rounds += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxIter rounds")
    } catch {
      case t: Throwable =>
        OperatorCaches.releaseCheckpoint(edges)
        OperatorCaches.releaseCheckpoint(ckpt)
        throw t
    }
    // the returned frame reads only its own (final) checkpoint; the edge
    // frame's blocks are done with — release now, register the final
    // checkpoint for the caller's OperatorCaches.release()
    OperatorCaches.releaseCheckpoint(edges)
    val finalCkpt = ckpt
    OperatorCaches.trackRelease(() => OperatorCaches.releaseCheckpoint(finalCkpt))
    labels
  }

  // ---- incremental (batch-vs-corpus) near-dup -----------------------------

  /** Incremental exact n-gram Jaccard: pairs with jaccard ≥ threshold
    * where AT LEAST ONE side is in `batch` — corpus-internal pairs are
    * never generated. The production dedup shape for an append-only
    * corpus: each ingest batch is checked against everything already
    * accepted (plus itself) without re-pairing the existing corpus.
    *
    * Same distinct-shingle contract as [[ngramJaccardPairsFrom]] (the
    * frame here is built internally from
    * [[graft.functions.ShingleWords]], so it holds by construction);
    * construction is likewise job-free — the capped-vs-uncapped choice is
    * the `maxDocFreq` argument, never a data-dependent count.
    *
    * Scale notes: the inverted index over corpus∪batch is the structure a
    * real pipeline PERSISTS between batches (it only ever grows by the
    * batch's grams); candidate generation is the same single co-occurrence
    * shuffle as [[ngramJaccardPairs]]' low-threshold path with the
    * new-pair restriction applied BEFORE the count aggregation, so
    * corpus×corpus co-occurrences are dropped at the join, not counted
    * and discarded. Output is (id1, id2, jaccard) with id1 < id2. */
  def ngramJaccardIncremental(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.3, maxDocFreq: Int = NoCap): DataFrame = {
    InputContracts.requireDeterministic(corpus, "ngramJaccardIncremental(corpus)")
    InputContracts.requireDeterministic(batch, "ngramJaccardIncremental(batch)")
    // Re-delivered ids (present in both sides — the normal at-least-once
    // ingest case) must not double their shingles in the index: the batch
    // copy supersedes the corpus copy (anti-join, broadcast-able batch
    // key set). Without this, a duplicated id doubles every co-occurrence
    // count and inflates jaccard past 1.0.
    val freshCorpus = corpus.join(batch.select(col(idCol)), Seq(idCol), "left_anti")
    val tagged = freshCorpus.select(col(idCol), col(textCol)).withColumn("__new", lit(false))
      .unionByName(batch.select(col(idCol), col(textCol)).withColumn("__new", lit(true)))
    val shingled = tagged.select(col(idCol), col("__new"),
      graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh"))
    // the persist pays off only on the capped path, where the index is a
    // join read from several subtrees; the uncapped path reads this
    // frame from ONE leg only (the full index below), so a cache there
    // is pure write overhead
    val withShingles =
      if (maxDocFreq == NoCap) shingled
      else OperatorCaches.track(shingled.persist(StorageLevel.MEMORY_AND_DISK))
    // each index row carries its doc's distinct-gram count (narrow at
    // explode time); where a branch doesn't use it, column pruning
    // removes it before the shuffle
    val inv = invFromShingles(withShingles, idCol,
      carry = Seq("__new" -> col("__new"),
        "sz" -> size(col("sh")).cast(LongType)))
    // "at least one side new" is enforced BEFORE the join, not filtered
    // after: the probe side is only the batch's index rows, so join
    // volume is |batch-index| × df, not |full-index| × df — the
    // difference between an incremental ingest and a full-corpus
    // recompute when the batch is small against a 100 TB corpus. Each
    // unordered pair is kept exactly once: (new, old) pairs only ever
    // appear with the new doc on the probe side; (new, new) pairs
    // appear twice and the id-order filter keeps the left-smaller
    // orientation.
    //
    // Honest computation-count accounting (an earlier revision claimed
    // both legs shared one reused exchange — they never did: the __new
    // filter pushes below a repartition, so the legs' exchange subtrees
    // differ and ReuseExchange cannot unify them; a review pass caught
    // the claim against the executed plan). The uncapped shape computes
    // the CORPUS lineage exactly once (full-index leg only — the probe
    // leg derives straight from `batch`, no anti-join, no union) and
    // the batch shingling twice (once per leg) — the side an
    // incremental pipeline keeps small by construction. Explicit
    // partition counts on both legs keep the join's sort parallelism at
    // the session's shuffle width (AQE coalesces bare repartitions to
    // its ~64 MB advisory target — the same pathology
    // ngramJaccardPairsFrom documents) and make the legs co-partitioned
    // so the join adds no further exchange. With a finite cap the
    // persisted capped index plays the sharing role instead. No job
    // runs at construction time either way — the old corpus count()
    // here was the exact driver-blocking pass a 100 TB pipeline would
    // pay per ingest batch. Plan-asserted in PlanSpec (explicit-N
    // repartitions, single anti-join, no cache on the uncapped path).
    val shufflePartitions =
      corpus.sparkSession.sessionState.conf.numShufflePartitions
    val (probeSide, fullSide) =
      if (maxDocFreq == NoCap) {
        val batchIdx = invFromShingles(
          batch.select(col(idCol),
            graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh")),
          idCol, carry = Seq("sz" -> size(col("sh")).cast(LongType)))
        (batchIdx.repartition(shufflePartitions, col("shingle")),
         inv.repartition(shufflePartitions, col("shingle")))
      } else {
        val capped = OperatorCaches.track(
          inv.join(
            inv.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
              .filter(col("__df") <= maxDocFreq).select(col("shingle")),
            Seq("shingle"))
            .persist(StorageLevel.MEMORY_AND_DISK))
        (capped.filter(col("__new")), capped)
      }
    val paired = probeSide.select(col("shingle"), col(idCol).as("__idn"),
        col("sz").as("__szn"))
      .join(fullSide.select(col("shingle"), col(idCol).as("__ido"),
        col("sz").as("__szo"), col("__new").as("__no")), Seq("shingle"))
      // size-ratio prune (J ≤ min/max; slacked, lossless vs the
      // round(J,4) ≥ t admission below — same argument as the batch
      // operator's co-occurrence branch) drops rows inside the join's
      // codegen stage, before the partial aggregation
      .filter(col("__idn") =!= col("__ido") &&
        !(col("__no") && col("__ido") < col("__idn")) &&
        least(col("__szn"), col("__szo")).cast(DoubleType) >=
          lit((threshold - 0.00005) * (1.0 - 1e-12)) *
            greatest(col("__szn"), col("__szo")).cast(DoubleType))
      // the carried sizes must follow the id1/id2 orientation
      .select(least(col("__idn"), col("__ido")).as("id1"),
              greatest(col("__idn"), col("__ido")).as("id2"),
              when(col("__idn") < col("__ido"), col("__szn"))
                .otherwise(col("__szo")).as("__s1"),
              when(col("__idn") < col("__ido"), col("__szo"))
                .otherwise(col("__szn")).as("__s2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("__inter"),
        first(col("__s1")).as("__s1"), first(col("__s2")).as("__s2"))
    paired
      .withColumn("jaccard", round(
        col("__inter").cast(DoubleType) /
        (col("__s1") + col("__s2") - col("__inter")).cast(DoubleType), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Incremental MinHash-LSH near-dup: verified-Jaccard pairs ≥
    * `threshold` where AT LEAST ONE side is in `batch` — corpus-internal
    * pairs are never generated (the banding analogue of
    * [[ngramJaccardIncremental]]; r14 verdict #5). The append-only
    * production shape: each ingest batch's band signatures probe the
    * buckets of the accepted corpus (plus the batch itself), so a small
    * batch against a 100 TB corpus pays |batch|-proportional probe and
    * verify cost, never a corpus×corpus re-pair.
    *
    * Distributed shape: the combined (corpus∖batch ∪ batch) shingle
    * frame goes through ONE id-keyed exchange reused by its three
    * consumers (the signature/banding leg and verifyJaccard's two
    * array-fetch joins — [[dedupMinHashPairsFrom]]'s contract); the full
    * band index is aggregated ONCE per (band, bucket) into a size-capped
    * id list (CappedCollector — the SINGLE candidate shuffle of the
    * corpus, saturated buckets dropped exactly as [[bucketPairs]] does),
    * and the batch-only probe leg joins it co-partitioned on
    * (band, bucket), so candidate volume is |batch-bands| × occupancy.
    * (new, old) pairs appear only with the new doc on the probe side;
    * (new, new) pairs appear twice and collapse in the pair `distinct`.
    * Re-delivered ids (present in both inputs — at-least-once ingest)
    * are superseded by the batch copy via the same anti-join as the
    * exact incremental. Recall regime is the banding's, identical to
    * the full operator at the same (numHashes, bands) — size low
    * thresholds with [[minHashParamsFor]]. */
  def minHashIncremental(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    InputContracts.requireDeterministic(corpus, "minHashIncremental(corpus)")
    InputContracts.requireDeterministic(batch, "minHashIncremental(batch)")
    val width = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val freshCorpus = corpus.join(batch.select(col(idCol)), Seq(idCol), "left_anti")
    val all = freshCorpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    // shingle-hash BEFORE the shared exchange (every consumer needs
    // exactly (id, sh), so pruning can't specialize the subtrees apart);
    // signatures AFTER it, on the band leg only
    val base = all.filter(col(idCol).isNotNull)
      .select(col(idCol),
        graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh"))
      .repartition(width, col(idCol))
    def bandRows(frame: DataFrame, outId: String) = frame
      .select(col(idCol),
        graft.functions.MinHashSig.minhashSig(col("sh"), numHashes).as("sig"))
      .select(col(idCol), explode(lshBands(col("sig"), numHashes, bands)).as("bb"))
      .select(col(idCol).as(outId), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val cappedIds = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    // the ONE corpus-wide shuffle: per-bucket capped id lists
    val buckets = bandRows(base, "__id").groupBy(col("band"), col("bucket"))
      .agg(cappedIds(col("__id")).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
    // probe leg derives straight from `batch` (no anti-join, no union) —
    // the side an incremental pipeline keeps small by construction, paid
    // once more here instead of forcing a second corpus-sized exchange
    val probe = bandRows(
        batch.filter(col(idCol).isNotNull).select(col(idCol),
          graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh")),
        "__idn")
      .repartition(width, col("band"), col("bucket"))
    val cands = probe.join(buckets, Seq("band", "bucket"))
      .select(col("__idn"), explode(col("__ids")).as("__ido"))
      .filter(col("__idn") =!= col("__ido"))
      .select(least(col("__idn"), col("__ido")).as("id1"),
              greatest(col("__idn"), col("__ido")).as("id2"))
      .distinct()
    verifyJaccard(cands, base, idCol, threshold)
  }

  /** Incremental banded-LSH cosine near-dup — [[minHashIncremental]]'s
    * shape for the embedding family: batch band signatures
    * ([[graft.functions.HyperplaneBandBuckets]], sized by
    * [[hyperplaneLshParamsFor]]) probe the combined corpus's capped
    * buckets; only batch-touching candidates are generated and each
    * survivor is exact-cosine-verified. Same single-candidate-shuffle
    * accounting as the MinHash form; the shared id-keyed exchange
    * carries (id, vec) to the band leg and both verify joins. Shuffle
    * width uses the operator rule of [[cosineNearDupLSHBanded]] with
    * the batch fraction unknowable at plan time, so the corpus-level
    * `params.expectedCandidates` acts as the upper bound — an
    * over-wide exchange costs task overhead, an under-wide one
    * sort-spills (the sf3 lesson); callers with a known small batch
    * can pass a session width instead. */
  def cosineLshIncremental(
      corpus: DataFrame, batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, params: HyperplaneLshParams,
      seed: Long = 7L, maxBucket: Int = 10000): DataFrame = {
    InputContracts.requireDeterministic(corpus, "cosineLshIncremental(corpus)")
    InputContracts.requireDeterministic(batch, "cosineLshIncremental(batch)")
    val sessParts = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val want = math.ceil(params.expectedCandidates / 2e6).toInt
    val wide = params.expectedCandidates > 0 && want > sessParts
    val width = if (wide) math.min(32768, want) else sessParts
    val freshCorpus = corpus.join(batch.select(col(idCol)), Seq(idCol), "left_anti")
    val all = freshCorpus.select(col(idCol), col(vecCol))
      .unionByName(batch.select(col(idCol), col(vecCol)))
    val base = all.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .repartition(width, col(idCol))
    def bandRows(frame: DataFrame, outId: String) = frame
      .select(col(idCol),
        graft.functions.HyperplaneSig.bandBuckets(col(vecCol), dim,
          params.bands, params.rowsPerBand, seed).as("hbb"))
      .select(col(idCol).as(outId),
        posexplode_outer(col("hbb")).as(Seq("band", "bucket")))
    val cappedIds = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    // wide mode must reach the HEAVY exchange too: without the explicit
    // repartition the bucket aggregation would plan at the session
    // width (the exact under-wide sort-spill the width rule exists to
    // prevent) and the probe join would lose co-partitioning against
    // it (r15 review pass). Non-wide keeps the bare groupBy — its
    // exchange already lands at the session width the probe leg uses.
    val fullBand = bandRows(base, "__id")
    val buckets = (if (wide) fullBand.repartition(width, col("band"), col("bucket"))
                   else fullBand)
      .groupBy(col("band"), col("bucket"))
      .agg(cappedIds(col("__id")).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
    val probe = bandRows(
        batch.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
          .select(col(idCol), col(vecCol)), "__idn")
      .repartition(width, col("band"), col("bucket"))
    val cands = probe.join(buckets, Seq("band", "bucket"))
      .select(col("__idn"), explode(col("__ids")).as("__ido"))
      .filter(col("__idn") =!= col("__ido"))
      .select(least(col("__idn"), col("__ido")).as("id1"),
              greatest(col("__idn"), col("__ido")).as("id2"))
      .distinct()
    cands
      .join(base.select(col(idCol).as("id1"), col(vecCol).as("v1")), "id1")
      .join(base.select(col(idCol).as("id2"), col(vecCol).as("v2")), "id2")
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) /
        (Similarity.norm(col("v1")) * Similarity.norm(col("v2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** Incremental SimHash near-dup — the [[minHashIncremental]] restriction
    * for the fingerprint family: the batch docs' band chunks probe the
    * combined (corpus∖batch ∪ batch) capped buckets, so only
    * batch-touching pairs are generated and a small ingest batch against
    * a 100 TB corpus pays |batch|-proportional probe cost, never a
    * corpus×corpus re-pair. The fingerprint IS the verifier here — one
    * long riding both the bucket lists ([[graft.functions.CappedCollector]]
    * of (id, sig)) and the probe rows — so unlike the MinHash/cosine
    * incrementals there are NO verify joins and no shared id-keyed
    * exchange: the whole operator is two (band, bucket) exchanges (the
    * corpus-wide capped-bucket aggregation and the batch probe leg,
    * co-partitioned so the join adds none) plus the pair `distinct`.
    *
    * Recall: same 4×16-bit pigeonhole banding as [[dedupSimHashPairs]] —
    * a batch-touching pair within hamming 3 shares a full chunk with
    * certainty, so at `maxHamming` ≤ 3 the output EQUALS the exact
    * restricted set (unsaturated buckets); beyond 3 recall is
    * probabilistic, exactly the full operator's regime. The same
    * [[simHashSaturationDocs]] bound applies to the COMBINED corpus
    * (fail fast via `nRows`); past ~6.5×10⁸ docs, band with
    * [[dedupSimHashPairsWide]]'s occupancy-sized layout instead.
    * Re-delivered ids (present in both inputs — at-least-once ingest)
    * are superseded by the batch copy via the d09 anti-join. */
  def simHashIncremental(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000,
      nRows: Option[Long] = None): DataFrame = {
    InputContracts.requireDeterministic(corpus, "simHashIncremental(corpus)")
    InputContracts.requireDeterministic(batch, "simHashIncremental(batch)")
    nRows.foreach { n =>
      require(n <= simHashSaturationDocs(maxBucket),
        s"simHashIncremental: combined n=$n exceeds the 64-bit " +
        s"fingerprint's band-space saturation bound " +
        s"(${simHashSaturationDocs(maxBucket)} docs at maxBucket=" +
        s"$maxBucket) — use dedupSimHashPairsWide's occupancy-sized " +
        "banding instead.")
    }
    val width = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val freshCorpus = corpus.join(batch.select(col(idCol)), Seq(idCol), "left_anti")
    val all = freshCorpus.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    def chunkRows(frame: DataFrame, outId: String, outSig: String) =
      simhash64Chunks(
        frame.filter(col(idCol).isNotNull)
          .select(col(idCol).as(outId), simhash64Sig(col(textCol)).as(outSig)),
        outSig)
    val cappedPairs =
      udaf(new graft.functions.CappedCollector[(Long, Long)](maxBucket))
    // the ONE corpus-wide shuffle: per-(band, bucket) capped (id, sig)
    // lists; size-1 buckets can only hold the probing doc itself, so
    // they are dropped like the full operator drops them
    val buckets = chunkRows(all, "__id", "__sig")
      .groupBy(col("band"), col("bucket"))
      .agg(cappedPairs(col("__id"), col("__sig")).as("__xs"))
      .filter(size(col("__xs")).between(2, maxBucket))
    // probe leg derives straight from `batch` (no anti-join, no union) —
    // the side an ingest pipeline keeps small by construction; its sig
    // recompute is the price of not forcing a second corpus-sized
    // exchange (minHashIncremental's accounting)
    val probe = chunkRows(batch, "__idn", "__sn")
      .repartition(width, col("band"), col("bucket"))
    probe.join(buckets, Seq("band", "bucket"))
      .select(col("__idn"), col("__sn"), explode(col("__xs")).as("__x"))
      .filter(col("__idn") =!= col("__x._1"))
      .select(least(col("__idn"), col("__x._1")).as("id1"),
              greatest(col("__idn"), col("__x._1")).as("id2"),
              bit_count(col("__sn").bitwiseXOR(col("__x._2"))).as("hamming"))
      .distinct() // (new,new) pairs arrive once per direction; hamming is
                  // a function of the pair, so the triple collapses
      .filter(col("hamming") <= maxHamming)
  }

  // ---- benchmark contamination --------------------------------------------

  /** Train/benchmark contamination check: which training documents share
    * word k-grams with a held-out benchmark set, and how many distinct
    * grams they share. The standard decontamination step before training
    * on web-scale corpora.
    *
    * Scale design: the benchmark gram set is DISTINCT + hashed to 8-byte
    * keys and **broadcast** — benchmarks are tiny (thousands of docs)
    * next to a 100 TB corpus, so the corpus-side gram stream never
    * shuffles; the join is a map-side hash probe at scan speed, and the
    * only shuffle is the final per-doc count (partial+final, keyed by the
    * training doc id). `countDistinct` there is exact but bounded by the
    * doc's own gram count. Returns (idCol, n_shared) for docs sharing at
    * least `minShared` distinct grams. */
  def contamination(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 5, minShared: Int = 1): DataFrame = {
    def grams(df: DataFrame, cols: Column*) =
      df.select((cols :+ explode(
        graft.functions.ShingleWords.shingleHashes(col(textCol), k)).as("g")): _*)
    val benchGrams = grams(bench).distinct()
    grams(train, col(idCol))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}

/** Per-query record of the auto-sized LSH parameters chosen during this
  * session, carried into the bench JSON (r13 ADVICE: round-over-round
  * totals at different sf compare different recall regimes unless the
  * chosen config travels with the numbers). Tiny and driver-side only. */
object LshParamsLog {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]
  def record(name: String, p: Dedup.HyperplaneLshParams): Unit = {
    m.put(name, s"b${p.bands}r${p.rowsPerBand}")
    ()
  }
  def snapshot: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toMap
  }
}
