package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IngestIndex, OperatorCaches, Similarity}

/** The carry-forward ingest index family: equivalence with the
  * recompute incrementals (which are themselves DuckDB-oracled), cap
  * semantics under incremental update, re-delivery idempotence, and the
  * property the family exists for — per-ingest shuffle volume that does
  * not grow with the corpus. */
class IngestIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf, "documents")
  private def emb = Tables.load(spark, sf, "embeddings")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("id1").cast("long"), col("id2").cast("long"),
        col(df.columns(2)).cast("double"))
      .as[(Long, Long, Double)].collect().toSet

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("cosine").cast("double"), col("rank").cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet

  /** Shuffle records written while `body` runs (async-bus-quiesced). */
  private def shuffleRecordsDuring(body: => Unit): Long =
    ShuffleMeter.recordsDuring(spark.sparkContext)(body)

  test("minHash: index-carried ingest == recompute incremental, first and steady state") {
    val (res, caches) = OperatorCaches.scoped {
      val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
      val b2 = docs.filter($"doc_id" >= 400)
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      val (p1, idx1) = IngestIndex.ingestMinHash(idx0, b1, "text", 0.8)
      val (p2, idx2) = IngestIndex.ingestMinHash(idx1, b2, "text", 0.8)
      val r1 = Dedup.minHashIncremental(docs.filter($"doc_id" < 300), b1,
        "doc_id", "text", threshold = 0.8)
      val r2 = Dedup.minHashIncremental(docs.filter($"doc_id" < 400), b2,
        "doc_id", "text", threshold = 0.8)
      (pairSet(p1), pairSet(p2), pairSet(r1), pairSet(r2), idx2.segments)
    }
    try {
      val (p1, p2, r1, r2, segs) = res
      assert(p1 == r1, s"first ingest diverges: ${p1.diff(r1)} / ${r1.diff(p1)}")
      assert(p2 == r2, s"steady state diverges: ${p2.diff(r2)} / ${r2.diff(p2)}")
      assert(p2.nonEmpty, "vacuous: the engineered dups straddle id 400")
      assert(segs == 3, "one segment per build/ingest")
    } finally caches.release()
  }

  test("minHash: equivalence holds under forced saturation (tiny caps)") {
    // maxBucket 2 saturates real buckets (engineered dups band
    // identically); both forms must drop exactly the same ones — and a
    // bucket saturated in the CARRIED state must stay saturated when
    // later segments re-touch it (the set-level cap argument)
    val (res, caches) = OperatorCaches.scoped {
      val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
      val b2 = docs.filter($"doc_id" >= 400)
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text", maxBucket = 2)
      val (_, idx1) = IngestIndex.ingestMinHash(idx0, b1, "text", 0.5)
      val (p2, _) = IngestIndex.ingestMinHash(idx1, b2, "text", 0.5)
      val r2 = Dedup.minHashIncremental(docs.filter($"doc_id" < 400), b2,
        "doc_id", "text", threshold = 0.5, maxBucket = 2)
      (pairSet(p2), pairSet(r2))
    }
    try {
      val (p2, r2) = res
      assert(p2 == r2, s"saturated divergence: ${p2.diff(r2)} / ${r2.diff(p2)}")
    } finally caches.release()
  }

  test("minHash: re-delivery is idempotent and compaction preserves results") {
    val (res, caches) = OperatorCaches.scoped {
      val b = docs.filter($"doc_id" >= 400)
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 400),
        "doc_id", "text")
      val (p, idx1) = IngestIndex.ingestMinHash(idx0, b, "text", 0.8)
      // at-least-once: the SAME batch arrives again — same pairs out,
      // index semantically unchanged
      val (pAgain, idx2) = IngestIndex.ingestMinHash(idx1, b, "text", 0.8)
      val compacted = IngestIndex.compactMinHash(idx2)
      val (pCompact, _) = IngestIndex.ingestMinHash(compacted, b, "text", 0.8)
      (pairSet(p), pairSet(pAgain), pairSet(pCompact), compacted.segments)
    }
    try {
      val (p, pAgain, pCompact, segs) = res
      assert(p.nonEmpty)
      assert(pAgain == p, "re-ingesting the same batch must not change pairs")
      assert(pCompact == p, "compaction must not change probe results")
      assert(segs == 1)
    } finally caches.release()
  }

  test("compaction truncates lineage: compacted frames are checkpoint leaves") {
    // a merely-persisted compact keeps the whole union-of-segments tree
    // in its logical plan, so every later ingest re-analyzes a plan
    // that grows with TOTAL ingests ever — SegmentProbe measured the
    // drift (post-compact ingests stuck at the never-compacted chain's
    // level until compaction checkpointed). Pin the truncation: after
    // compact, the index frames' analyzed plans are LogicalRDD leaves,
    // strictly smaller than the pre-compact union tree.
    val (res, caches) = OperatorCaches.scoped {
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      val (_, idx1) = IngestIndex.ingestMinHash(idx0,
        docs.filter($"doc_id" >= 300 && $"doc_id" < 400), "text", 0.8)
      val (p2, idx2) = IngestIndex.ingestMinHash(idx1,
        docs.filter($"doc_id" >= 400), "text", 0.8)
      p2.count() // consume the chain like a real pipeline would
      val compacted = IngestIndex.compactMinHash(idx2)
      def nodes(df: org.apache.spark.sql.DataFrame): Int = {
        var n = 0
        df.queryExecution.analyzed.foreach(_ => n += 1)
        n
      }
      def isCheckpointLeaf(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.analyzed.collect {
          case _: org.apache.spark.sql.execution.LogicalRDD => ()
        }.nonEmpty && nodes(df) <= 2
      (nodes(idx2.buckets), nodes(compacted.buckets),
        isCheckpointLeaf(compacted.buckets),
        isCheckpointLeaf(compacted.docs))
    } // scope release also exercises the checkpoint-release registration
    try {
      val (preNodes, postNodes, bucketsLeaf, docsLeaf) = res
      assert(preNodes > postNodes,
        s"pre-compact union tree ($preNodes nodes) should dwarf the " +
        s"compacted plan ($postNodes)")
      assert(bucketsLeaf, "compacted buckets must be a checkpoint leaf")
      assert(docsLeaf, "compacted doc store must be a checkpoint leaf")
    } finally caches.release()
  }

  test("cosine: index-carried ingest == recompute incremental") {
    val (res, caches) = OperatorCaches.scoped {
      val corpus = emb.filter($"vec_id" < 300)
      val batch = emb.filter($"vec_id" >= 300)
      val params = Dedup.hyperplaneLshParamsFor(500L, threshold = 0.4,
        recallFloor = 0.95, maxBands = 64)
      val idx = IngestIndex.buildCosine(corpus, "vec_id", "embedding",
        dim = 64, params = params)
      val (p, idx1) = IngestIndex.ingestCosine(idx, batch, threshold = 0.4)
      val r = Dedup.cosineLshIncremental(corpus, batch, "vec_id",
        "embedding", threshold = 0.4, dim = 64, params = params)
      (pairSet(p), pairSet(r), idx1.segments)
    }
    try {
      val (p, r, segs) = res
      assert(p == r, s"cosine diverges: ${p.diff(r)} / ${r.diff(p)}")
      assert(p.nonEmpty, "vacuous: near-dup embeddings straddle id 300")
      assert(segs == 2)
    } finally caches.release()
  }

  test("simHash: index-carried ingest == recompute incremental") {
    val (res, caches) = OperatorCaches.scoped {
      val corpus = docs.filter($"doc_id" < 400)
      val batch = docs.filter($"doc_id" >= 400)
      val idx = IngestIndex.buildSimHash(corpus, "doc_id", "text")
      val (p, _) = IngestIndex.ingestSimHash(idx, batch, "text",
        maxHamming = 8)
      val r = Dedup.simHashIncremental(corpus, batch, "doc_id", "text",
        maxHamming = 8)
      (pairSet(p), pairSet(r))
    }
    try {
      val (p, r) = res
      assert(p == r, s"simhash diverges: ${p.diff(r)} / ${r.diff(p)}")
      assert(p.nonEmpty)
    } finally caches.release()
  }

  test("save/load: a reloaded index continues the ingest chain identically") {
    // the production shape — carried state must outlive the session
    // that built it; the parquet copy collapses segments into one
    // physical table without merging rows, which the probe-time merge
    // already handles, so the continuation is bit-identical
    val dir = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val (res, caches) = OperatorCaches.scoped {
      val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
      val b2 = docs.filter($"doc_id" >= 400)
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      val (_, idx1) = IngestIndex.ingestMinHash(idx0, b1, "text", 0.8)
      val (pDirect, _) = IngestIndex.ingestMinHash(idx1, b2, "text", 0.8)
      IngestIndex.saveMinHash(idx1, dir)
      val reloaded = IngestIndex.loadMinHash(spark, dir)
      val paramsMatch = reloaded.segments == idx1.segments &&
        reloaded.k == idx1.k && reloaded.bands == idx1.bands &&
        reloaded.numHashes == idx1.numHashes &&
        reloaded.maxBucket == idx1.maxBucket
      // loads persist by default: without it every ingest against a
      // loaded index re-reads the corpus parquet per batch. (The
      // cache=false negative is checked on the cosine path below —
      // storageLevel matches by PLAN, so once a path is cache-loaded an
      // uncached load of the same path reports the existing entry.)
      val loadCached = reloaded.buckets.storageLevel.useMemory &&
        reloaded.docs.storageLevel.useMemory
      val (pReloaded, idxR2) = IngestIndex.ingestMinHash(reloaded, b2,
        "text", 0.8)
      // the production loop: save the ADVANCED index back to the SAME
      // path — its lineage still reads v1's parquet, which versioned
      // writes must tolerate (an in-place overwrite throws)
      IngestIndex.saveMinHash(idxR2, dir)
      val reloaded2 = IngestIndex.loadMinHash(spark, dir)
      val segsMatch = reloaded2.segments == idxR2.segments
      val (pAgain, _) = IngestIndex.ingestMinHash(reloaded2, b2, "text", 0.8)
      (pairSet(pDirect), pairSet(pReloaded), pairSet(pAgain), paramsMatch,
        segsMatch, loadCached)
    }
    try {
      val (pDirect, pReloaded, pAgain, paramsMatch, segsMatch,
        loadCached) = res
      assert(paramsMatch, "reloaded params diverge from the saved index")
      assert(segsMatch, "second-save segment count diverges")
      assert(loadCached,
        "load must persist by default and stream with cache = false")
      assert(pDirect.nonEmpty)
      assert(pReloaded == pDirect,
        s"reloaded-index ingest diverges: ${pDirect.diff(pReloaded)} / " +
        s"${pReloaded.diff(pDirect)}")
      // re-delivery through the save → load → ingest loop is still
      // idempotent (b2 is already in the v2 index)
      assert(pAgain == pDirect,
        "same-path save/load chain diverges on re-delivered batch")
      // family marker is enforced
      val ex = intercept[IllegalArgumentException] {
        IngestIndex.loadSimHash(spark, dir)
      }
      assert(ex.getMessage.contains("minhash"))
      // pruning keeps only the current version and the index still loads
      assert(IngestIndex.pruneVersions(spark, dir) == 1) // v1 removed
      assert(IngestIndex.loadMinHash(spark, dir).segments == 3)
    } finally caches.release()
    // the other two families' param sidecars round-trip (incl. the
    // cosine plane config, whose doubles/booleans parse back exactly) —
    // assertions live OUTSIDE the scoped body so a failure still
    // releases the build caches
    val params = graft.operators.Dedup.HyperplaneLshParams(
      bands = 7, rowsPerBand = 5, predictedRecall = 0.9753,
      clamped = true, nRows = 123L)
    val (res2, caches2) = OperatorCaches.scoped {
      val dir2 = java.nio.file.Files.createTempDirectory("graft-idx2").toString
      val c = IngestIndex.buildCosine(emb.filter($"vec_id" < 50),
        "vec_id", "embedding", dim = 64, params = params, seed = 11L,
        maxBucket = 77)
      IngestIndex.saveCosine(c, dir2)
      // cache = false must stream (this path was never cache-loaded,
      // so the plan-matching storageLevel lookup is meaningful here)
      val cr = IngestIndex.loadCosine(spark, dir2, cache = false)
      val dir3 = java.nio.file.Files.createTempDirectory("graft-idx3").toString
      val sh = IngestIndex.buildSimHash(docs.filter($"doc_id" < 50),
        "doc_id", "text", maxBucket = 99)
      IngestIndex.saveSimHash(sh, dir3)
      val shr = IngestIndex.loadSimHash(spark, dir3)
      (cr, shr)
    }
    try {
      val (cr, shr) = res2
      assert(cr.params == params && cr.seed == 11L && cr.maxBucket == 77 &&
        cr.dim == 64 && cr.idCol == "vec_id" && cr.vecCol == "embedding")
      assert(!cr.buckets.storageLevel.useMemory &&
        !cr.docs.storageLevel.useMemory,
        "cache = false load must stream from storage")
      assert(shr.maxBucket == 99 && shr.idCol == "doc_id" &&
        shr.segments == 1)
    } finally caches2.release()
  }

  test("probe routing: the shuffle route equals the broadcast route, including via save/load") {
    // r16 verdict #1: the probe frames are batch-proportional but not
    // driver-sized — above the gate they must ride the co-partitioned
    // shuffled-hash route instead of a broadcast. The routes may only
    // differ in plan shape: pin output equality for all three members
    // with the gate forced to 0 (everything shuffles) against the
    // default (everything broadcasts), in steady state (multi-segment
    // probe), and across a save/load (whose segments are re-clustered
    // on load precisely so this route stays corpus-exchange-free).
    val dir = java.nio.file.Files.createTempDirectory("graft-route").toString
    val (res, caches) = OperatorCaches.scoped {
      val b1 = docs.filter($"doc_id" >= 300 && $"doc_id" < 400)
      val b2 = docs.filter($"doc_id" >= 400)
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      val (_, idx1) = IngestIndex.ingestMinHash(idx0, b1, "text", 0.8)
      val (pB, _) = IngestIndex.ingestMinHash(idx1, b2, "text", 0.8)
      val (pS, _) = IngestIndex.ingestMinHash(idx1, b2, "text", 0.8,
        broadcastGateRows = 0L)
      IngestIndex.saveMinHash(idx1, dir)
      val (pL, _) = IngestIndex.ingestMinHash(
        IngestIndex.loadMinHash(spark, dir), b2, "text", 0.8,
        broadcastGateRows = 0L)
      val params = Dedup.hyperplaneLshParamsFor(500L, threshold = 0.4,
        recallFloor = 0.95, maxBands = 64)
      val cIdx = IngestIndex.buildCosine(emb.filter($"vec_id" < 300),
        "vec_id", "embedding", dim = 64, params = params)
      val (cB, _) = IngestIndex.ingestCosine(cIdx,
        emb.filter($"vec_id" >= 300), threshold = 0.4)
      val (cS, _) = IngestIndex.ingestCosine(cIdx,
        emb.filter($"vec_id" >= 300), threshold = 0.4,
        broadcastGateRows = 0L)
      val sIdx = IngestIndex.buildSimHash(docs.filter($"doc_id" < 400),
        "doc_id", "text")
      val (sB, _) = IngestIndex.ingestSimHash(sIdx,
        docs.filter($"doc_id" >= 400), "text", maxHamming = 8)
      val (sS, _) = IngestIndex.ingestSimHash(sIdx,
        docs.filter($"doc_id" >= 400), "text", maxHamming = 8,
        broadcastGateRows = 0L)
      (pairSet(pB), pairSet(pS), pairSet(pL), pairSet(cB), pairSet(cS),
        pairSet(sB), pairSet(sS))
    }
    try {
      val (pB, pS, pL, cB, cS, sB, sS) = res
      assert(pB.nonEmpty && cB.nonEmpty && sB.nonEmpty, "vacuous fixture")
      assert(pS == pB, s"minhash routes diverge: ${pS.diff(pB)} / ${pB.diff(pS)}")
      assert(pL == pB, s"loaded shuffle route diverges: ${pL.diff(pB)} / ${pB.diff(pL)}")
      assert(cS == cB, s"cosine routes diverge: ${cS.diff(cB)} / ${cB.diff(cS)}")
      assert(sS == sB, s"simhash routes diverge: ${sS.diff(sB)} / ${sB.diff(sS)}")
    } finally caches.release()
  }

  test("probe routing: shuffle-route ingest volume still tracks the batch, not the corpus") {
    // the broadcast-route twin of this pin lives below ("ingest shuffle
    // volume tracks the batch"); the shuffle route must keep the same
    // property — its exchanges are the batch's own segment builds plus
    // the batch-proportional merge, never the corpus
    val batch = docs.filter($"doc_id" >= 400)
    def shuffleRouteRecords(corpusMax: Int): Long = {
      val (records, caches) = OperatorCaches.scoped {
        val idx = IngestIndex.buildMinHash(docs.filter($"doc_id" < corpusMax),
          "doc_id", "text")
        idx.buckets.count(); idx.docs.count()
        shuffleRecordsDuring {
          val (p, _) = IngestIndex.ingestMinHash(idx, batch, "text", 0.8,
            broadcastGateRows = 0L)
          p.collect()
        }
      }
      caches.release()
      records
    }
    val small = shuffleRouteRecords(150)
    val big = shuffleRouteRecords(400)
    assert(big <= small * 1.5 + 100,
      s"shuffle-route ingest must not track the corpus: $small @150 docs " +
      s"vs $big @400 docs")
  }

  test("deletes: tombstoned ingest == surviving-corpus recompute; upserts verify new content; tombs survive save/load") {
    // unsaturated regime (default caps): delete-then-ingest must equal
    // the recompute incremental on the corpus WITHOUT the deleted ids,
    // both before and after compaction; a re-delivered delete is
    // idempotent (applied twice here); pending tombstones ride
    // save/load; and an upsert's pairs verify against the NEW content
    // (reference: recompute with the old versions removed).
    val dir = java.nio.file.Files.createTempDirectory("graft-del").toString
    val (res, caches) = OperatorCaches.scoped {
      val b2 = docs.filter($"doc_id" >= 400)
      val refAll = Dedup.minHashIncremental(docs.filter($"doc_id" < 400),
        b2, "doc_id", "text", threshold = 0.8)
      // deleted set = the even ids that actually pair with b2, so the
      // delete provably changes the answer while survivors remain
      val delIds = refAll
        .select(explode(array($"id1", $"id2")).as("doc_id")).distinct()
        .filter($"doc_id" < 400 && $"doc_id" % 2 === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDel = delIds.count()
      val surviving = docs.filter($"doc_id" < 400)
        .join(delIds, Seq("doc_id"), "left_anti")
      val idx0 = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      val (_, idx1) = IngestIndex.ingestMinHash(idx0,
        docs.filter($"doc_id" >= 300 && $"doc_id" < 400), "text", 0.8)
      val idxDel = IngestIndex.deleteMinHash(
        IngestIndex.deleteMinHash(idx1, delIds), delIds)
      val (pPre, _) = IngestIndex.ingestMinHash(idxDel, b2, "text", 0.8)
      val (pPost, _) = IngestIndex.ingestMinHash(
        IngestIndex.compactMinHash(idxDel), b2, "text", 0.8)
      val ref = Dedup.minHashIncremental(surviving, b2, "doc_id", "text",
        threshold = 0.8)
      IngestIndex.saveMinHash(idxDel, dir)
      val (pLoaded, _) = IngestIndex.ingestMinHash(
        IngestIndex.loadMinHash(spark, dir), b2, "text", 0.8)
      // upsert on a synthetic trio whose outcome is fully determined:
      // docs 1,2 share text A, doc 10 carries text B; upserting doc 2
      // to text B must pair it with 10 (against the NEW content) and
      // with nothing from its old life as an A-dup
      val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      val tB = "one two three four five six seven eight nine ten eleven"
      val trio = Seq((1L, tA), (2L, tA), (10L, tB)).toDF("doc_id", "text")
      val uIdx = IngestIndex.buildMinHash(trio, "doc_id", "text")
      val modB = Seq((2L, tB)).toDF("doc_id", "text")
      val (pUp, _) = IngestIndex.upsertMinHash(uIdx, modB, "text", 0.8)
      val refUp = Dedup.minHashIncremental(
        Seq((1L, tA), (10L, tB)).toDF("doc_id", "text"), modB,
        "doc_id", "text", threshold = 0.8)
      (nDel, pairSet(pPre), pairSet(pPost), pairSet(pLoaded), pairSet(ref),
        pairSet(pUp), pairSet(refUp))
    }
    try {
      val (nDel, pPre, pPost, pLoaded, ref, pUp, refUp) = res
      assert(nDel > 0, "vacuous: no even id of <400 pairs with b2")
      assert(ref.nonEmpty, "vacuous: the delete removed every pair")
      assert(pPre == ref,
        s"pre-compact delete diverges: ${pPre.diff(ref)} / ${ref.diff(pPre)}")
      assert(pPost == ref,
        s"post-compact delete diverges: ${pPost.diff(ref)} / ${ref.diff(pPost)}")
      assert(pLoaded == ref,
        "pending tombstones must survive save/load")
      assert(pUp == refUp,
        s"upsert diverges from new-content recompute: ${pUp.diff(refUp)} / " +
        s"${refUp.diff(pUp)}")
      assert(pUp == Set((2L, 10L, 1.0)),
        s"upsert must pair doc 2 with 10 via its NEW content only, got $pUp")
    } finally caches.release()
  }

  test("deletes: a bucket saturated only by deleted ids unsaturates at compact") {
    // the subtle half of the delete contract (r16 verdict #2): a capped
    // list that saturated holds an arbitrary cap+1 subset, so a MERGE
    // could never prove the survivors fit the cap — compaction instead
    // rebuilds buckets from the surviving doc store, exactly like a
    // from-scratch build. Six identical docs saturate every bucket at
    // maxBucket=3 (cap+1 = 4 stored); deleting four leaves two
    // survivors, so survivors + newcomer = 3 fits the cap and the
    // compacted index must pair the newcomer with both survivors just
    // as a fresh build would — while the pre-compact form must still
    // honor the unconditional guarantee (no deleted id in any pair).
    val (res, caches) = OperatorCaches.scoped {
      val text = "the quick brown fox jumps over the lazy dog again and again"
      val corpus = (1L to 6L).map(i => (i, text)).toDF("doc_id", "text")
      val batch = Seq((7L, text)).toDF("doc_id", "text")
      val idx0 = IngestIndex.buildMinHash(corpus, "doc_id", "text",
        maxBucket = 3)
      val delIds = (1L to 4L).map(Tuple1(_)).toDF("doc_id")
      val idxDel = IngestIndex.deleteMinHash(idx0, delIds)
      val (pPre, _) = IngestIndex.ingestMinHash(idxDel, batch, "text", 0.8)
      val compacted = IngestIndex.compactMinHash(idxDel)
      val maxList = compacted.buckets
        .agg(max(size($"__ids"))).collect()(0).getInt(0)
      val (pPost, _) = IngestIndex.ingestMinHash(compacted, batch, "text",
        0.8)
      val ref = Dedup.minHashIncremental(
        corpus.filter($"doc_id" >= 5), batch, "doc_id", "text",
        threshold = 0.8, maxBucket = 3)
      (pairSet(pPre), pairSet(pPost), pairSet(ref), maxList)
    }
    try {
      val (pPre, pPost, ref, maxList) = res
      assert(ref == Set((5L, 7L, 1.0), (6L, 7L, 1.0)),
        s"fixture broke: fresh rebuild should pair the newcomer with " +
        s"both survivors, got $ref")
      assert(pPost == ref,
        s"post-compact diverges from the from-scratch rebuild: $pPost")
      assert(maxList <= 3,
        s"compaction must UNsaturate the bucket (survivors fit the cap), " +
        s"stored list still has $maxList entries")
      assert(pPre.forall { case (a, b, _) => a >= 5 && b >= 5 },
        s"a deleted id appeared in pre-compact pairs: $pPre")
    } finally caches.release()
  }

  test("save recovery: a missing root pointer falls back to the newest complete version") {
    // the two crash states a versioned save can leave (ADVICE r16):
    // (a) death inside the root-pointer delete+rename — NO params.json
    //     at the root, but every v<N> carries its own complete-marker
    //     copy, so loads must recover from the newest complete one;
    // (b) death mid-table-write — an orphan v<M> WITHOUT its marker,
    //     which the fallback must skip (its tables are torn) and whose
    //     number the next save must not reuse (nextVersion scans dirs).
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val (_, caches) = OperatorCaches.scoped {
      val idx = IngestIndex.buildMinHash(docs.filter($"doc_id" < 50),
        "doc_id", "text")
      IngestIndex.saveMinHash(idx, dir) // v1
      IngestIndex.saveMinHash(idx, dir) // v2 — newest complete
    }
    try {
      // crash state (a): root pointer gone
      assert(java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "params.json")))
      // crash state (b): an orphan, marker-less v9 from a torn save
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "v9"))
      val recovered = IngestIndex.loadMinHash(spark, dir, cache = false)
      assert(recovered.segments == 1 && recovered.k == 3,
        "fallback load must recover the newest complete version's params")
      // the fallback picked v2 (complete), not the marker-less v9: the
      // recovered frames' file scans read under v2
      val scanned = recovered.buckets.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
      assert(scanned.exists(_.contains("/v2/")) &&
        !scanned.exists(_.contains("/v9/")),
        s"fallback must read v2, not the orphan v9: $scanned")
      // the orphan's number must never be reused — a save after
      // recovery lands PAST it (a live loaded index could still be
      // scanning whatever the torn save managed to write)
      IngestIndex.saveMinHash(recovered, dir)
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(dir, "v10", "params.json")),
        "post-recovery save must take v10, one past the orphan v9")
      assert(java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "params.json"))) // re-crash for (b)
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(dir, "v10", "params.json"))
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "v10"))
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      // nothing complete at all → a load fails loudly, naming the path
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "v1", "params.json"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(dir, "v2", "params.json"))
      val ex = intercept[IllegalArgumentException] {
        IngestIndex.loadMinHash(spark, dir, cache = false)
      }
      assert(ex.getMessage.contains("no complete"))
    } finally caches.release()
  }

  test("at rest, a bucket-index segment prunes storage-side") {
    // the scaladoc's 100 TB sentence — "the segments are bucketed
    // tables and the broadcast probes become storage-side bucket
    // pruning" — verified in miniature instead of argued: a segment
    // written via Scale.writeBucketed(bucket) and probed with the
    // ingest path's (band, bucket)-key filter shape reads ONLY the
    // matching bucket files (SelectedBucketsCount < total), i.e. the
    // probe prunes before any task launches.
    val (_, caches) = OperatorCaches.scoped {
      val idx = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      graft.operators.Scale.writeBucketed(idx.buckets,
        "ingest_buckets_at_rest", "bucket", 8)
    }
    val prevAuto = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      // the auto heuristic (DisableUnnecessaryBucketedScan) turns the
      // bucketed read off for a bare filter+collect because nothing
      // downstream consumes the distribution — which also forfeits the
      // pruning this test measures; a real probe pipeline keeps the
      // bucketed scan for the same reason it bucketed the table
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val probed = spark.table("ingest_buckets_at_rest")
        .filter($"bucket".isin(1L, 2L, 3L))
      probed.collect()
      val plan = probed.queryExecution.executedPlan.toString
      val sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined,
        s"expected a bucket-pruned scan, got:\n${plan.take(2000)}")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"bucket filter must prune files: ${sel.get.matched}")
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.sql("DROP TABLE IF EXISTS ingest_buckets_at_rest")
      caches.release()
    }
  }

  test("streaming: a foreachBatch ingest loop with mid-stream compact+save matches the recompute") {
    // the e14 gate's production loop pinned in-suite, with the state
    // assertions the driver row can't carry: the index must actually
    // advance per micro-batch, the mid-stream compact must fold the
    // segments, and the reloaded state must carry the chain to the
    // same final answer the one-call recompute incremental gives.
    val tmp = java.nio.file.Files.createTempDirectory("graft-e14spec").toString
    val inDir = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val (res, caches) = OperatorCaches.scoped {
      val base = docs.select($"doc_id", $"text")
      val corpus = base.filter($"doc_id" < 300)
      val streamed = base.filter($"doc_id" >= 300)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      for (i <- 0 until 3) {
        val lo = 300L + i * 70
        val hi = if (i == 2) Long.MaxValue else lo + 70
        val staging = s"$tmp/stage$i"
        streamed.filter($"doc_id" >= lo && $"doc_id" < hi)
          .repartition(1).write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(inDir, f"b$i%02d.parquet"))
      }
      var idx = IngestIndex.buildMinHash(corpus, "doc_id", "text")
      var segsAtSave = -1
      var batches = 0
      val parts = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.DataFrame]()
      val onBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          Long) => Unit = (b, _) => {
        val batch = b.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        batch.count()
        val (p, next) = IngestIndex.ingestMinHash(idx, batch, "text", 0.8)
        val pp = p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pp.count()
        parts += pp
        idx = next
        batches += 1
        if (batches == 2) {
          idx = IngestIndex.compactMinHash(idx)
          IngestIndex.saveMinHash(idx, s"$tmp/idx")
          idx = IngestIndex.loadMinHash(spark, s"$tmp/idx")
          segsAtSave = idx.segments
        }
      }
      val q = spark.readStream.schema(streamed.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch(onBatch)
        .start()
      q.awaitTermination()
      val got = pairSet(parts.reduce(_ unionByName _).distinct())
      val ref = pairSet(Dedup.minHashIncremental(corpus, streamed,
        "doc_id", "text", threshold = 0.8))
      (got, ref, batches, segsAtSave, idx.segments)
    }
    try {
      val (got, ref, batches, segsAtSave, finalSegs) = res
      assert(batches == 3, s"expected 3 micro-batches (one per file), got $batches")
      assert(segsAtSave == 1, "mid-stream compact must fold to one segment")
      assert(finalSegs == 1 + (batches - 2),
        "the reloaded index must keep advancing per batch")
      assert(got.nonEmpty)
      assert(got == ref,
        s"streamed ingest diverges: ${got.diff(ref)} / ${ref.diff(got)}")
    } finally caches.release()
  }

  test("at rest, a doc-store segment prunes storage-side for the verify fetch") {
    // the missing half of the at-rest story (r16 verdict #4 / What's
    // wrong #3): the bucket index had its SelectedBucketsCount pin but
    // the verify fetch (id-keyed) had none — an unbucketed docs table
    // at rest would scan every file per fetch. Write a doc segment
    // id-bucketed via Scale.writeBucketed and probe it with the fetch's
    // id-set filter shape: only the matching bucket files may be read.
    val (_, caches) = OperatorCaches.scoped {
      val idx = IngestIndex.buildMinHash(docs.filter($"doc_id" < 300),
        "doc_id", "text")
      graft.operators.Scale.writeBucketed(idx.docs,
        "ingest_docs_at_rest", "doc_id", 8)
    }
    val prevAuto = spark.conf.get(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      val probed = spark.table("ingest_docs_at_rest")
        .filter($"doc_id".isin(11L, 42L, 97L))
      probed.collect()
      val plan = probed.queryExecution.executedPlan.toString
      val sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r
        .findFirstMatchIn(plan)
      assert(sel.isDefined,
        s"expected a bucket-pruned scan, got:\n${plan.take(2000)}")
      assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
        s"the id filter must prune doc-store files: ${sel.get.matched}")
    } finally {
      spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.sql("DROP TABLE IF EXISTS ingest_docs_at_rest")
      caches.release()
    }
  }

  test("ivf: carried index search == one-shot search on the union") {
    // the ANN member of the carried-index family: centroids frozen on
    // the corpus (production trains the quantizer once), ingest assigns
    // ONLY the batch. Equality with one-shot ivfTopKWithCells on the
    // union is EXACT — full rows incl. cosine and rank — because cell
    // assignment is per-row deterministic given the frozen cells; and
    // it must survive re-delivery (search-time collapse) and compaction
    // (per-id fold + lineage truncation).
    val (res, caches) = OperatorCaches.scoped {
      val corpus = emb.filter($"vec_id" < 300)
      val batch = emb.filter($"vec_id" >= 300)
      val (cents, _) = Similarity.kmeansFit(corpus, k = 8, iters = 3)
      val centFrame = cents.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("cell_id", "cell_vec")
      val queries = emb.filter($"vec_id" % 25 === 0)
        .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
      val idx0 = Similarity.buildIvfIndex(corpus, centFrame)
      val idx1 = Similarity.ivfIngest(idx0, batch)
      val carried = topkSet(Similarity.ivfSearchIndex(idx1, queries, 5, 3))
      val oneShot = topkSet(
        Similarity.ivfTopKWithCells(emb, queries, centFrame, 5, 3))
      val idx2 = Similarity.ivfIngest(idx1, batch) // re-delivery
      val again = topkSet(Similarity.ivfSearchIndex(idx2, queries, 5, 3))
      val compacted = Similarity.compactIvfIndex(idx2)
      val comp = topkSet(Similarity.ivfSearchIndex(compacted, queries, 5, 3))
      (carried, oneShot, again, comp, idx1.segments, compacted.segments)
    }
    try {
      val (carried, oneShot, again, comp, segs, compSegs) = res
      assert(carried.nonEmpty)
      assert(carried == oneShot,
        s"carried diverges: ${carried.diff(oneShot)} / ${oneShot.diff(carried)}")
      assert(carried.exists(_._2 >= 300),
        "vacuous: no returned neighbor came from the ingested batch")
      assert(again == carried, "re-delivered batch must not change results")
      assert(comp == carried, "compaction must not change results")
      assert(segs == 2 && compSegs == 1)
    } finally caches.release()
  }

  test("ivf: save/load round-trips; ingest never touches the corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val (res, caches) = OperatorCaches.scoped {
      val corpus = emb.filter($"vec_id" < 300)
      val batch = emb.filter($"vec_id" >= 300)
      val bRows = batch.count()
      val (cents, _) = Similarity.kmeansFit(corpus, k = 8, iters = 3)
      val centFrame = cents.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("cell_id", "cell_vec")
      val queries = emb.filter($"vec_id" % 25 === 0)
        .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
      val idx0 = Similarity.buildIvfIndex(corpus, centFrame)
      idx0.assigned.count() // materialize the build outside the window
      // ingest = assign the batch only: one batch-proportional max_by
      // exchange (≤ a few rows per batch vector), nothing corpus-sized
      var idx1: Similarity.IvfIndex = null
      val ingestRecords = shuffleRecordsDuring {
        idx1 = Similarity.ivfIngest(idx0, batch)
        idx1.assigned.count()
      }
      Similarity.saveIvfIndex(idx1, dir)
      val reloaded = Similarity.loadIvfIndex(spark, dir)
      val direct = topkSet(Similarity.ivfSearchIndex(idx1, queries, 5, 3))
      val viaDisk = topkSet(Similarity.ivfSearchIndex(reloaded, queries, 5, 3))
      (bRows, ingestRecords, direct, viaDisk, reloaded.segments,
        idx1.segments)
    }
    try {
      val (bRows, ingestRecords, direct, viaDisk, segsR, segs) = res
      // the ingest window covers the batch assign + the count's cached
      // corpus scan (no shuffle); allow partial-agg padding but nothing
      // corpus-shaped
      assert(ingestRecords <= bRows * 3 + 200,
        s"ivf ingest shuffled $ingestRecords records for a $bRows-row batch")
      assert(direct.nonEmpty && viaDisk == direct,
        "reloaded ivf index diverges from the in-session one")
      assert(segsR == segs)
      val ex = intercept[IllegalArgumentException] {
        IngestIndex.loadMinHash(spark, dir)
      }
      assert(ex.getMessage.contains("ivf"))
    } finally caches.release()
  }

  test("ingest shuffle volume tracks the batch, not the corpus") {
    // THE property the family exists for (r15 verdict's weak): the
    // recompute incremental re-shuffles the corpus per batch; the
    // carried form's exchanges are batch-proportional. Measure shuffle
    // records written per ingest of the SAME batch against a small and
    // a large corpus: the carried form must stay ~flat where the
    // recompute form grows with the corpus, and must shuffle well under
    // half of what the recompute form shuffles at the large corpus.
    val batch = docs.filter($"doc_id" >= 400)
    def carriedIngestRecords(corpusMax: Int): Long = {
      val (records, caches) = OperatorCaches.scoped {
        val idx = IngestIndex.buildMinHash(docs.filter($"doc_id" < corpusMax),
          "doc_id", "text")
        idx.buckets.count(); idx.docs.count() // build outside the window
        shuffleRecordsDuring {
          val (p, _) = IngestIndex.ingestMinHash(idx, batch, "text", 0.8)
          p.collect()
        }
      }
      caches.release()
      records
    }
    val carriedSmall = carriedIngestRecords(150)
    val carriedBig = carriedIngestRecords(400)
    val recompute = shuffleRecordsDuring {
      Dedup.minHashIncremental(docs.filter($"doc_id" < 400), batch,
        "doc_id", "text", threshold = 0.8).collect()
    }
    assert(carriedBig <= carriedSmall * 1.5 + 100,
      s"carried ingest shuffle must not track the corpus: " +
      s"$carriedSmall @150 docs vs $carriedBig @400 docs")
    assert(carriedBig * 2 < recompute,
      s"carried ingest must shuffle well under the recompute form: " +
      s"carried=$carriedBig recompute=$recompute")
  }
}
