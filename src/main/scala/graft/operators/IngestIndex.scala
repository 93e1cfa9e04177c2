package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Carry-forward near-duplicate ingest indexes — the amortized form of
  * the incremental dedup family (`Dedup.minHashIncremental` /
  * `cosineLshIncremental` / `simHashIncremental`).
  *
  * The recompute incrementals restrict PAIR volume to batch-touching
  * pairs, but every call re-shingles / re-signs the whole corpus and
  * re-shuffles it to rebuild the (band, bucket) index — per-ingest cost
  * is corpus-proportional, which is exactly what an incremental pipeline
  * exists to avoid (r15 verdict's `weak`). This object carries the
  * index as first-class state instead: `build` pays the corpus-sized
  * job ONCE, and each `ingest` is `(index, batch) → (pairs,
  * updatedIndex)` where the only exchanges are batch-proportional.
  *
  * == State representation: log-structured segments ==
  *
  * An index is a pair of frames, each a UNION of per-ingest persisted
  * segments (the LSM idea in DataFrame algebra):
  *
  *  - `buckets`: (band, bucket, list) — per-segment capped id lists
  *    ([[graft.functions.CappedCollector]], cap = maxBucket + 1 as the
  *    saturation sentinel, same convention as the one-shot operators);
  *  - `docs`: the verify store — (id, shingle-hash array) for MinHash,
  *    (id, vector) for cosine; SimHash needs none (the fingerprint
  *    rides the bucket list and IS the verifier).
  *
  * Appending a segment never touches old ones, so the steady-state
  * ingest path has NO corpus-sized exchange: the corpus enters the
  * ingest plan ONLY as the stream side of broadcast hash probes (the
  * batch's touched (band, bucket) keys, and the candidate ids for
  * verify fetch, are broadcast into narrow scans of the cached
  * segments). Spec-pinned two ways (IngestIndexSpec): shuffle records
  * written per ingest do not grow with the corpus, and the executed
  * plan joins the index exclusively through BroadcastHashJoin (no
  * SortMergeJoin, no corpus re-scan from files).
  *
  * == Cap semantics under incremental update ==
  *
  * The one-shot operators drop saturated buckets (list size > cap).
  * CappedCollector keeps cap+1 FIRST-ARRIVAL elements — not a
  * deterministic subset — so equivalence with the recompute form holds
  * at the SET level, which is all pair generation observes:
  *
  *  - an UNSATURATED per-segment list is the segment's complete id set
  *    (nothing was dropped below the cap), so the deduplicated concat
  *    across segments is the complete corpus∪batch set whenever no
  *    segment saturated;
  *  - a SATURATED segment list has cap+1 entries, and dedup can only
  *    shrink a concat below cap+1 by removing cross-segment duplicates
  *    of ids the list still contains — so a bucket that ever saturated
  *    measures ≥ cap+1 forever ("a bucket that saturates stays
  *    saturated") and keeps being dropped exactly like the recompute
  *    form drops it.
  *
  * Probe-time merge is therefore `array_distinct(flatten(...))` over
  * ONLY the probed buckets (batch-proportional rows), with the same
  * `size BETWEEN 2 AND maxBucket` admission as the one-shot operators.
  * Index-carried output == recompute-form output is driver-pinned
  * (d14 gate) and spec-pinned per member, including under forced
  * saturation (tiny caps) and across multi-batch steady state.
  *
  * == Re-delivery (at-least-once ingest) ==
  *
  * A re-delivered id (same id, same content — the at-least-once
  * contract; changed content is an upsert, which belongs to
  * [[compactMinHash]]-then-rebuild, not ingest) lands in a second
  * segment with IDENTICAL band rows and doc row. The probe-time
  * `array_distinct` and the verify fetch's per-id `first()` collapse
  * both copies, so re-ingesting a batch yields the same pairs frame and
  * a semantically unchanged index (spec-pinned idempotence).
  *
  * == Maintenance ==
  *
  * Segments accumulate one per ingest; every probe reads all of them
  * (bounded by segment COUNT, not corpus size, per probed bucket).
  * `compact*` folds them back into one segment — the corpus-sized
  * exchange, paid on the caller's schedule (nightly), never on the
  * ingest path — and TRUNCATES LINEAGE (eager `localCheckpoint`): the
  * folded frame's plan would otherwise keep the whole union tree and
  * every later ingest would re-analyze a plan growing with total
  * ingests ever (measured — see [[persistTruncated]]). At 100 TB the
  * segments are bucketed tables and the broadcast probes become
  * storage-side bucket pruning — not just argued: a segment written
  * via [[Scale.writeBucketed]] and probed with the ingest filter
  * shape reads only the matching bucket files (SelectedBucketsCount,
  * spec-pinned in IngestIndexSpec). In-session they are
  * MEMORY_AND_DISK frames registered with [[OperatorCaches]]; loads
  * persist by default. Cache lifetime follows
  * the epoch pattern (measured in `graft.SegmentProbe`, numbers in
  * PERF.md r16): hold each ingest's segment caches in a scope, and
  * release the superseded scopes once a compact has materialized —
  * never before (the checkpointed compact cannot recompute). The
  * measured schedule at sf1: per-ingest wall drifts ≈0.1–0.2 s per
  * accumulated segment past ~10 segments while shuffle stays flat, and
  * an 8-ingest compaction cadence held the chain at its segment-2
  * floor; with compact cost C and per-segment tax τ, compact every
  * ≈ sqrt(2C/τ) ingests.
  */
object IngestIndex {

  /** Carried MinHash-LSH state. `buckets`: (band, bucket, __ids);
    * `docs`: (idCol, sh) — the shingle store verifyJaccard fetches
    * from. Parameters ride with the state so an ingest can never probe
    * with a different signature scheme than the index was built with. */
  final case class MinHashIndex(
      buckets: DataFrame, docs: DataFrame, idCol: String,
      k: Int, numHashes: Int, bands: Int, maxBucket: Int, segments: Int)

  /** Carried hyperplane-LSH cosine state. `docs`: (idCol, vecCol). */
  final case class CosineIndex(
      buckets: DataFrame, docs: DataFrame, idCol: String, vecCol: String,
      dim: Int, params: Dedup.HyperplaneLshParams, seed: Long,
      maxBucket: Int, segments: Int)

  /** Carried SimHash state — self-contained: the capped lists hold
    * (id, fingerprint) structs, so there is no doc store and no verify
    * fetch. */
  final case class SimHashIndex(
      buckets: DataFrame, idCol: String, maxBucket: Int, segments: Int)

  private[operators] def persist(df: DataFrame): DataFrame =
    OperatorCaches.track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Persist AND truncate lineage (eager `localCheckpoint`). Compaction
    * must use this, not [[persist]]: a merely-persisted compact keeps
    * the whole union-of-segments tree in its logical plan, so every
    * subsequent ingest re-analyzes a plan that grows with TOTAL ingests
    * ever — the drift is measurable (SegmentProbe: post-compact ingests
    * stuck at the never-compacted chain's level until compaction
    * truncated). At 100 TB compaction is a table write and truncation
    * is inherent; `localCheckpoint` is the in-session analog. The
    * checkpointed frame cannot recompute once released — release its
    * scope only after a newer compact supersedes it (the same contract
    * [[Dedup.connectedComponents]] documents for its labels). */
  private[operators] def persistTruncated(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint() // eager: materializes + truncates
    OperatorCaches.trackRelease(() => OperatorCaches.releaseCheckpoint(cp))
    cp
  }

  /** Probe-time merged view of the buckets a batch touches: broadcast
    * the batch's (band, bucket) keys into a narrow scan of every
    * segment (the ONLY way the corpus-sized frames enter an ingest
    * plan), then merge per-bucket lists at the set level. Output rows
    * and the following exchange are batch-proportional. */
  private def probeMerged(allSegments: DataFrame, batchKeys: DataFrame,
      listCol: String, maxBucket: Int): DataFrame =
    allSegments
      .join(broadcast(batchKeys.select(col("band"), col("bucket"))),
        Seq("band", "bucket"))
      .groupBy(col("band"), col("bucket"))
      .agg(array_distinct(flatten(collect_list(col(listCol)))).as("__set"))
      // same admission rule as the one-shot operators: singleton buckets
      // can only pair a doc with itself; > maxBucket is saturation
      .filter(size(col("__set")).between(2, maxBucket))

  /** Candidate (id1, id2) pairs for the id-list families: the batch
    * segment's lists exploded as probe rows, joined to the merged probed
    * buckets — both sides batch-proportional. (new, old) pairs appear
    * once; (new, new) pairs twice, collapsed by the distinct. */
  private def candidatePairs(batchSegment: DataFrame, probed: DataFrame,
      listCol: String): DataFrame =
    batchSegment
      .select(col("band"), col("bucket"), explode(col(listCol)).as("__idn"))
      .join(probed, Seq("band", "bucket"))
      .select(col("__idn"), explode(col("__set")).as("__ido"))
      .filter(col("__idn") =!= col("__ido"))
      .select(least(col("__idn"), col("__ido")).as("id1"),
        greatest(col("__idn"), col("__ido")).as("id2"))
      .distinct()

  // ---- MinHash ------------------------------------------------------------

  private def minHashBandRows(docsSh: DataFrame, idCol: String,
      numHashes: Int, bands: Int): DataFrame =
    docsSh
      .select(col(idCol),
        graft.functions.MinHashSig.minhashSig(col("sh"), numHashes).as("sig"))
      .select(col(idCol),
        explode(Dedup.lshBands(col("sig"), numHashes, bands)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))

  private def minHashSegment(docsSh: DataFrame, idCol: String,
      numHashes: Int, bands: Int, maxBucket: Int): DataFrame = {
    val capped = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    minHashBandRows(docsSh, idCol, numHashes, bands)
      .groupBy(col("band"), col("bucket"))
      .agg(capped(col(idCol)).as("__ids"))
  }

  /** One-time corpus-sized job: shingle store + capped bucket index.
    * Same signature scheme as [[Dedup.minHashIncremental]] at the same
    * (k, numHashes, bands), so a pipeline can adopt the carried form
    * against an existing corpus and get identical pairs (d14 gate). */
  def buildMinHash(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000): MinHashIndex = {
    InputContracts.requireDeterministic(corpus, "buildMinHash(corpus)")
    val docs = persist(corpus.filter(col(idCol).isNotNull)
      .select(col(idCol),
        graft.functions.ShingleWords.shingleHashes(col(textCol), k).as("sh")))
    val buckets = persist(
      minHashSegment(docs, idCol, numHashes, bands, maxBucket))
    MinHashIndex(buckets, docs, idCol, k, numHashes, bands, maxBucket, 1)
  }

  /** Verified-Jaccard pairs (id1, id2, jaccard) where at least one side
    * is in `batch`, plus the index advanced by the batch — the
    * steady-state ingest step. Batch ids must be unique within the
    * batch; a re-delivered id must carry identical content (class doc).
    * Every exchange in the returned plan is batch-proportional. */
  def ingestMinHash(index: MinHashIndex, batch: DataFrame, textCol: String,
      threshold: Double): (DataFrame, MinHashIndex) = {
    InputContracts.requireDeterministic(batch, "ingestMinHash(batch)")
    val idCol = index.idCol
    // the batch's doc segment is the shared narrow base: band rows and
    // both verify fetches read it, so shingling runs once per batch
    val batchDocs = persist(batch.filter(col(idCol).isNotNull)
      .select(col(idCol),
        graft.functions.ShingleWords.shingleHashes(col(textCol),
          index.k).as("sh")))
    val batchBuckets = persist(minHashSegment(batchDocs, idCol,
      index.numHashes, index.bands, index.maxBucket))
    val allBuckets = index.buckets.unionByName(batchBuckets)
    val probed = probeMerged(allBuckets, batchBuckets, "__ids",
      index.maxBucket)
    // the probe rows are the batch segment EXPLODED — no second signing
    // pass. A batch-internally saturated bucket caps its probe ids, but
    // those ids could only have probed that same saturated bucket,
    // which `probed` drops — so the candidate set matches the
    // uncapped-probe recompute form exactly (spec-pinned under forced
    // tiny caps). Persisted: the verify fetch's broadcast id set AND the
    // verify join both read it — unpersisted, the explode+distinct (the
    // ingest's heaviest stage) runs twice (IngestProbe caught it on the
    // cosine member at sf1; numbers in PERF.md r16).
    val cands = persist(candidatePairs(batchBuckets, probed, "__ids"))
    val allDocs = index.docs.unionByName(batchDocs)
    val pairs = Dedup.verifyJaccard(cands,
      fetchDocs(allDocs, cands, idCol, "sh"), idCol, threshold)
    (pairs, index.copy(buckets = allBuckets, docs = allDocs,
      segments = index.segments + 1))
  }

  /** Fold every segment back into one (the corpus-sized exchange, paid
    * on the caller's schedule — never on the ingest path). The capped
    * slice keeps the saturation sentinel: a deduplicated list past
    * cap+1 stays at cap+1, still measured saturated by every probe. */
  def compactMinHash(index: MinHashIndex): MinHashIndex =
    index.copy(
      buckets = persistTruncated(compactBuckets(index.buckets, "__ids",
        index.maxBucket)),
      docs = persistTruncated(compactDocs(index.docs, index.idCol, "sh")),
      segments = 1)

  // ---- cosine ---------------------------------------------------------------

  private def cosineBandRows(docsVec: DataFrame, idCol: String, vecCol: String,
      dim: Int, params: Dedup.HyperplaneLshParams, seed: Long): DataFrame =
    docsVec
      .select(col(idCol),
        graft.functions.HyperplaneSig.bandBuckets(col(vecCol), dim,
          params.bands, params.rowsPerBand, seed).as("hbb"))
      .select(col(idCol),
        posexplode_outer(col("hbb")).as(Seq("band", "bucket")))

  private def cosineSegment(docsVec: DataFrame, idCol: String, vecCol: String,
      dim: Int, params: Dedup.HyperplaneLshParams, seed: Long,
      maxBucket: Int): DataFrame = {
    val capped = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    cosineBandRows(docsVec, idCol, vecCol, dim, params, seed)
      .groupBy(col("band"), col("bucket"))
      .agg(capped(col(idCol)).as("__ids"))
  }

  /** One-time corpus job for the embedding family — plane set fixed by
    * (params, seed) exactly as [[Dedup.cosineLshIncremental]] fixes it,
    * so carried and recompute forms band identically. */
  def buildCosine(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, params: Dedup.HyperplaneLshParams, seed: Long = 7L,
      maxBucket: Int = 10000): CosineIndex = {
    InputContracts.requireDeterministic(corpus, "buildCosine(corpus)")
    val docs = persist(corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol)))
    val buckets = persist(
      cosineSegment(docs, idCol, vecCol, dim, params, seed, maxBucket))
    CosineIndex(buckets, docs, idCol, vecCol, dim, params, seed,
      maxBucket, 1)
  }

  /** Exact-cosine-verified pairs (id1, id2, cosine) with at least one
    * side in `batch`, plus the advanced index. Same batch contracts as
    * [[ingestMinHash]]. The corpus-level wide-exchange rule of
    * [[Dedup.cosineLshIncremental]] does not apply here: every exchange
    * is batch-proportional, so the session width is the right size
    * unless the BATCH itself is corpus-scale — at which point the
    * recompute form is the honest tool. */
  def ingestCosine(index: CosineIndex, batch: DataFrame,
      threshold: Double): (DataFrame, CosineIndex) = {
    InputContracts.requireDeterministic(batch, "ingestCosine(batch)")
    val idCol = index.idCol
    val vecCol = index.vecCol
    val batchDocs = persist(batch
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol)))
    val batchBuckets = persist(cosineSegment(batchDocs, idCol, vecCol,
      index.dim, index.params, index.seed, index.maxBucket))
    val allBuckets = index.buckets.unionByName(batchBuckets)
    val probed = probeMerged(allBuckets, batchBuckets, "__ids",
      index.maxBucket)
    // persisted for the same two-consumer reason as the MinHash member
    val cands = persist(candidatePairs(batchBuckets, probed, "__ids"))
    val allDocs = index.docs.unionByName(batchDocs)
    val fetched = fetchDocs(allDocs, cands, idCol, vecCol)
    val pairs = cands
      .join(fetched.select(col(idCol).as("id1"), col(vecCol).as("v1")), "id1")
      .join(fetched.select(col(idCol).as("id2"), col(vecCol).as("v2")), "id2")
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) /
          (Similarity.norm(col("v1")) * Similarity.norm(col("v2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
    (pairs, index.copy(buckets = allBuckets, docs = allDocs,
      segments = index.segments + 1))
  }

  /** [[compactMinHash]] for the embedding family. */
  def compactCosine(index: CosineIndex): CosineIndex =
    index.copy(
      buckets = persistTruncated(compactBuckets(index.buckets, "__ids",
        index.maxBucket)),
      docs = persistTruncated(compactDocs(index.docs, index.idCol,
        index.vecCol)),
      segments = 1)

  // ---- SimHash --------------------------------------------------------------

  private def simHashSegment(frame: DataFrame, idCol: String,
      maxBucket: Int): DataFrame = {
    val capped =
      udaf(new graft.functions.CappedCollector[(Long, Long)](maxBucket))
    Dedup.simhash64Chunks(
        frame.filter(col(idCol).isNotNull)
          .select(col(idCol).as("__id"),
            Dedup.simhash64Sig(col("__text")).as("__sig")),
        "__sig")
      .groupBy(col("band"), col("bucket"))
      .agg(capped(col("__id"), col("__sig")).as("__xs"))
  }

  /** One-time corpus job for the fingerprint family. The 64-bit
    * band-space saturation bound ([[Dedup.simHashSaturationDocs]])
    * applies to the corpus PLUS everything it will ingest — size with
    * headroom or band wide. */
  def buildSimHash(corpus: DataFrame, idCol: String, textCol: String,
      maxBucket: Int = 10000): SimHashIndex = {
    InputContracts.requireDeterministic(corpus, "buildSimHash(corpus)")
    val buckets = persist(simHashSegment(
      corpus.select(col(idCol), col(textCol).as("__text")), idCol,
      maxBucket))
    SimHashIndex(buckets, idCol, maxBucket, 1)
  }

  /** Hamming pairs (id1, id2, hamming ≤ maxHamming) with at least one
    * side in `batch`, plus the advanced index. No verify fetch: the
    * fingerprint rides both the bucket lists and the probe rows. */
  def ingestSimHash(index: SimHashIndex, batch: DataFrame, textCol: String,
      maxHamming: Int = 3): (DataFrame, SimHashIndex) = {
    InputContracts.requireDeterministic(batch, "ingestSimHash(batch)")
    val batchBuckets = persist(simHashSegment(
      batch.select(col(index.idCol), col(textCol).as("__text")),
      index.idCol, index.maxBucket))
    val allBuckets = index.buckets.unionByName(batchBuckets)
    val probed = probeMerged(allBuckets, batchBuckets, "__xs",
      index.maxBucket)
    val pairs = batchBuckets
      .select(col("band"), col("bucket"), explode(col("__xs")).as("__n"))
      .join(probed, Seq("band", "bucket"))
      .select(col("__n"), explode(col("__set")).as("__x"))
      .filter(col("__n._1") =!= col("__x._1"))
      .select(least(col("__n._1"), col("__x._1")).as("id1"),
        greatest(col("__n._1"), col("__x._1")).as("id2"),
        bit_count(col("__n._2").bitwiseXOR(col("__x._2"))).as("hamming"))
      .distinct() // (new,new) pairs arrive once per direction; hamming is
                  // a function of the pair, so the triple collapses
      .filter(col("hamming") <= maxHamming)
    (pairs, index.copy(buckets = allBuckets,
      segments = index.segments + 1))
  }

  /** [[compactMinHash]] for the fingerprint family. */
  def compactSimHash(index: SimHashIndex): SimHashIndex =
    index.copy(buckets = persistTruncated(compactBuckets(index.buckets,
      "__xs", index.maxBucket)), segments = 1)

  // ---- durable state ----------------------------------------------------

  /** Persist the carried state as parquet tables + a params sidecar —
    * the shape that survives sessions (an ingest pipeline's index must
    * outlive any one driver; the in-session caches are just the hot
    * copy). Writing the segment-union frame collapses the segments into
    * one physical table WITHOUT merging rows — multiple rows per
    * (band, bucket) are exactly what the probe-time merge already
    * handles, so save/load changes nothing semantically (spec-pinned:
    * a reloaded index continues an ingest chain identically). Call
    * [[compactMinHash]] first when the segment count warrants it.
    *
    * Saves are VERSIONED: each save writes a fresh `v<N>` directory and
    * flips `params.json` to it last, so (a) the load → ingest → save
    * loop works against ONE path even though the saved frame's lineage
    * still reads the previous version's parquet (an in-place overwrite
    * would throw "cannot overwrite a path that is also being read
    * from"), and (b) a failure mid-save leaves the previous version
    * complete and still referenced. Old versions are NOT deleted here —
    * a live index loaded earlier in some session may still scan them;
    * call [[pruneVersions]] once none does.
    *
    * SINGLE WRITER PER PATH: versioning protects against crashes, not
    * against concurrency. Two concurrent savers can pick the same
    * `v<N>` ([[nextVersion]] is scan-then-use, not an atomic reserve),
    * interleave parquet writes into one directory, and last-rename-wins
    * on the pointer — coordinate externally (one compaction/save owner
    * per index path, the same contract a streaming query's checkpoint
    * dir carries). Crash recovery IS handled: each version carries its
    * own `params.json` copy written after its tables, so a save that
    * died before flipping the root pointer leaves the previous version
    * referenced, and a death inside the pointer flip itself is
    * recovered by [[readParamsMap]] falling back to the newest COMPLETE
    * version. */
  def saveMinHash(index: MinHashIndex, path: String): Unit = {
    val spark = index.docs.sparkSession
    val v = nextVersion(spark, path)
    index.buckets.write.mode("overwrite").parquet(s"$path/v$v/buckets")
    index.docs.write.mode("overwrite").parquet(s"$path/v$v/docs")
    writeParams(spark, path, Map(
      "family" -> "minhash", "version" -> v, "idCol" -> index.idCol,
      "k" -> index.k, "numHashes" -> index.numHashes,
      "bands" -> index.bands, "maxBucket" -> index.maxBucket,
      "segments" -> index.segments))
  }

  /** Reload a [[saveMinHash]] index. By default the frames are
    * persisted (and [[OperatorCaches]]-tracked) on load: without that,
    * EVERY ingest against a loaded index silently re-reads the corpus
    * parquet — the per-batch corpus cost this family exists to avoid.
    * The first action materializes the cache. Pass `cache = false` to
    * stream from storage instead (a one-shot probe, or state larger
    * than the session should pin). */
  def loadMinHash(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): MinHashIndex = {
    val p = readParams(spark, path, "minhash")
    val v = p("version")
    def frame(name: String) = {
      val f = spark.read.parquet(s"$path/v$v/$name")
      if (cache) persist(f) else f
    }
    MinHashIndex(frame("buckets"), frame("docs"),
      p("idCol"), p("k").toInt, p("numHashes").toInt, p("bands").toInt,
      p("maxBucket").toInt, p("segments").toInt)
  }

  /** [[saveMinHash]] for the embedding family. */
  def saveCosine(index: CosineIndex, path: String): Unit = {
    val spark = index.docs.sparkSession
    val v = nextVersion(spark, path)
    index.buckets.write.mode("overwrite").parquet(s"$path/v$v/buckets")
    index.docs.write.mode("overwrite").parquet(s"$path/v$v/docs")
    writeParams(spark, path, Map(
      "family" -> "cosine", "version" -> v, "idCol" -> index.idCol,
      "vecCol" -> index.vecCol, "dim" -> index.dim,
      "bands" -> index.params.bands,
      "rowsPerBand" -> index.params.rowsPerBand,
      "predictedRecall" -> index.params.predictedRecall,
      "clamped" -> index.params.clamped, "nRows" -> index.params.nRows,
      "seed" -> index.seed, "maxBucket" -> index.maxBucket,
      "segments" -> index.segments))
  }

  /** Reload a [[saveCosine]] index ([[loadMinHash]]'s cache default). */
  def loadCosine(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): CosineIndex = {
    val p = readParams(spark, path, "cosine")
    val v = p("version")
    def frame(name: String) = {
      val f = spark.read.parquet(s"$path/v$v/$name")
      if (cache) persist(f) else f
    }
    CosineIndex(frame("buckets"), frame("docs"),
      p("idCol"), p("vecCol"), p("dim").toInt,
      Dedup.HyperplaneLshParams(p("bands").toInt, p("rowsPerBand").toInt,
        p("predictedRecall").toDouble, p("clamped").toBoolean,
        p("nRows").toLong),
      p("seed").toLong, p("maxBucket").toInt, p("segments").toInt)
  }

  /** [[saveMinHash]] for the fingerprint family. */
  def saveSimHash(index: SimHashIndex, path: String): Unit = {
    val spark = index.buckets.sparkSession
    val v = nextVersion(spark, path)
    index.buckets.write.mode("overwrite").parquet(s"$path/v$v/buckets")
    writeParams(spark, path, Map(
      "family" -> "simhash", "version" -> v, "idCol" -> index.idCol,
      "maxBucket" -> index.maxBucket, "segments" -> index.segments))
  }

  /** Reload a [[saveSimHash]] index ([[loadMinHash]]'s cache default). */
  def loadSimHash(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): SimHashIndex = {
    val p = readParams(spark, path, "simhash")
    val f = spark.read.parquet(s"$path/v${p("version")}/buckets")
    SimHashIndex(if (cache) persist(f) else f,
      p("idCol"), p("maxBucket").toInt, p("segments").toInt)
  }

  /** Delete version directories other than the one `params.json`
    * currently points at; returns how many were removed. Only call
    * when no live index loaded from an OLDER version of this path is
    * still in use anywhere — its parquet scans would start failing. */
  def pruneVersions(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val keep = s"v${readParamsMap(spark, path)("version")}"
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches("v\\d+") && st.getPath.getName != keep)
      .count(st => fs.delete(st.getPath, true))
  }

  /** Next save version: one past the MAX of the params-referenced
    * version and any `v<N>` directory present. Scanning the directories
    * matters for crash recovery: a save that died between writing its
    * new version dir and flipping params.json leaves an orphan vN (and
    * a save that died inside the params delete+rename leaves NO
    * params.json at all) — counting only params.json would then reuse a
    * version number and overwrite files a live loaded index may still
    * be scanning. */
  private[operators] def nextVersion(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fromDirs =
      if (fs.exists(dir))
        fs.listStatus(dir).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
          .map(_.getPath.getName.drop(1).toInt)
          .maxOption.getOrElse(0)
      else 0
    val fromParams =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/params.json")))
        readParamsMap(spark, path).get("version").map(_.toInt).getOrElse(0)
      else 0
    math.max(fromDirs, fromParams) + 1
  }

  // The sidecar is a flat string map serialized with jackson (a hard
  // Spark dependency — always on the classpath), written through the
  // Hadoop FS API so it lands wherever the tables do. Two copies per
  // save: `v<N>/params.json` FIRST (written after the version's tables,
  // so its presence marks the version complete), then the root
  // `params.json` pointer. The root write goes to a temp file and
  // renames over the target — on a posix/HDFS rename that is atomic,
  // but the delete-then-rename still has a metadata-op window; a crash
  // inside it leaves NO root pointer, which readParamsMap recovers from
  // via the newest complete version's own copy.
  private[operators] def writeParams(spark: org.apache.spark.sql.SparkSession,
      path: String, params: Map[String, Any]): Unit = {
    val m = new java.util.TreeMap[String, String]()
    params.foreach { case (k, v) => m.put(k, v.toString) }
    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(m)
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // completeness marker inside the version dir (save* calls this
    // after the tables are down, so marker-present ⇒ tables complete)
    params.get("version").foreach { v =>
      val inVersion = new org.apache.hadoop.fs.Path(s"$path/v$v/params.json")
      val out = fs.create(inVersion, true)
      try out.write(bytes) finally out.close()
    }
    val target = new org.apache.hadoop.fs.Path(s"$path/params.json")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.params.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    fs.delete(target, false)
    require(fs.rename(tmp, target),
      s"could not move $tmp over $target")
  }

  /** Root `params.json` if present; otherwise fall back to the NEWEST
    * version directory that carries its own complete-marker copy (a
    * save that crashed inside the root-pointer flip leaves exactly this
    * state — ADVICE r16: without the fallback every later load of the
    * path would throw even though a complete version sits on disk). An
    * orphan `v<N>` WITHOUT the marker is an incomplete table write and
    * is skipped. */
  private[operators] def readParamsMap(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAt(p: org.apache.hadoop.fs.Path): Map[String, String] = {
      val in = fs.open(p)
      val json =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json)
      val b = Map.newBuilder[String, String]
      node.properties().forEach(e => b += e.getKey -> e.getValue.asText())
      b.result()
    }
    val root = new org.apache.hadoop.fs.Path(s"$path/params.json")
    if (fs.exists(root)) readAt(root)
    else {
      val complete = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
        .map(_.getPath.getName.drop(1).toInt)
        .sorted(Ordering[Int].reverse)
        .find(v => fs.exists(
          new org.apache.hadoop.fs.Path(s"$path/v$v/params.json")))
      require(complete.isDefined,
        s"$path has no params.json and no complete v<N> version to " +
        "recover from")
      readAt(new org.apache.hadoop.fs.Path(
        s"$path/v${complete.get}/params.json"))
    }
  }

  private[operators] def readParams(spark: org.apache.spark.sql.SparkSession,
      path: String, expectFamily: String): Map[String, String] = {
    val m = readParamsMap(spark, path)
    require(m.get("family").contains(expectFamily),
      s"$path holds a '${m.getOrElse("family", "?")}' index, expected " +
      s"'$expectFamily'")
    m
  }

  // ---- shared state maintenance ---------------------------------------------

  private def compactBuckets(buckets: DataFrame, listCol: String,
      maxBucket: Int): DataFrame =
    buckets.groupBy(col("band"), col("bucket"))
      .agg(slice(array_distinct(flatten(collect_list(col(listCol)))),
        1, maxBucket + 1).as(listCol))

  private def compactDocs(docs: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    docs.groupBy(col(idCol))
      .agg(first(col(payloadCol)).as(payloadCol))

  /** Verify-store fetch: broadcast the candidate ids into a narrow scan
    * of the doc segments (no corpus exchange), then collapse re-delivered
    * duplicates — identical by contract, so `first` is value-
    * deterministic. Output is candidate-proportional and read twice by
    * the verify joins, so it persists for the pairs frame's lifetime. */
  private def fetchDocs(allDocs: DataFrame, cands: DataFrame,
      idCol: String, payloadCol: String): DataFrame = {
    val needed = cands.select(col("id1").as(idCol))
      .unionByName(cands.select(col("id2").as(idCol)))
      .distinct()
    persist(allDocs.join(broadcast(needed), Seq(idCol))
      .groupBy(col(idCol))
      .agg(first(col(payloadCol)).as(payloadCol)))
  }
}
