package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextOps}
import graft.functions.SimHash64

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace splitting with empty guard") {
    val got = Seq("a b  c", "  ", "one").toDF("t")
      .select(TextOps.tokenCount($"t").as("n")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 1))
  }

  test("bpeish token count splits words, digits, punct") {
    val got = Seq("hello, world 42!").toDF("t")
      .select(TextOps.bpeishTokenCount($"t").as("n")).as[Int].head()
    // hello , world 4 2 !  -> 6
    assert(got == 6)
  }

  test("normalize collapses whitespace and lowercases") {
    val got = Seq("  Hello   WORLD  ").toDF("t")
      .select(TextOps.normalize($"t").as("n")).as[String].head()
    assert(got == "hello world")
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq("Hello  World", "hello world").toDF("t")
      .select(TextOps.fingerprint($"t").as("f")).as[String].collect().toSeq
    assert(fps(0) == fps(1))
  }

  test("rollingHash is order-sensitive (unlike a bag hash)") {
    val hs = Seq("a b c", "c b a").toDF("t")
      .select(TextOps.rollingHash($"t").as("h")).as[Long].collect().toSeq
    assert(hs(0) != hs(1))
  }

  test("langId picks the profile with most hits") {
    val got = Seq(
      "the cat is on the mat and a dog",
      "der hund ist ein tier und das haus",
      "xyzzy qwerty").toDF("t")
      .select(TextOps.langId($"t").as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("qualityScore is in [0,1]") {
    val docs = Tables.load(spark, sf, "documents")
    val mm = docs.select(TextOps.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("tfidfTopTerms: hand-checked corpus") {
    // 3 docs; "cat" in 1 doc (idf ln3), "dog" in all 3 (idf 0)
    val docs = Seq(
      (1L, "cat cat dog"), (2L, "dog bird"), (3L, "dog fish")).toDF("id", "tx")
    val out = TextOps.tfidfTopTerms(docs, "id", "tx", topK = 2)
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._4).map(r => (r._2, r._3)).toList }
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(1L) === List(("cat", r4(2 * math.log(3.0))), ("dog", 0.0)))
    assert(out(2L) === List(("bird", r4(math.log(3.0))), ("dog", 0.0)))
    assert(out(3L) === List(("fish", r4(math.log(3.0))), ("dog", 0.0)))
  }

  test("redactPii: emails and phones replaced, counts agree") {
    val df = Seq(
      "write a.b-c_d@ex-1.co today",
      "call +1-555-0001234 or +44-20-7946-0958 now",
      "no pii here",
      "x@y.io and +1-555-9998877 both").toDF("tx")
      .select($"tx", TextOps.redactPii($"tx").as("red"),
        TextOps.emailCount($"tx").as("ne"), TextOps.phoneCount($"tx").as("np"))
    val rows = df.as[(String, String, Int, Int)].collect().toList
    assert(rows(0)._2 === "write <EMAIL> today" && rows(0)._3 === 1 && rows(0)._4 === 0)
    assert(rows(1)._2 === "call <PHONE> or <PHONE> now" && rows(1)._4 === 2)
    assert(rows(2)._2 === "no pii here" && rows(2)._3 === 0 && rows(2)._4 === 0)
    assert(rows(3)._2 === "<EMAIL> and <PHONE> both")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: sliding word 3-grams, distinct") {
    val got = Seq("a b c d a b c d").toDF("t")
      .select(Dedup.shingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(got.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("shingles: short doc falls back to whole text") {
    val got = Seq("a b").toDF("t")
      .select(Dedup.shingles($"t", 3).as("s")).as[Seq[String]].head()
    assert(got == Seq("a b"))
  }

  test("minhash: identical texts give identical signatures; disjoint differ") {
    val df = Seq((1L, "x y z w v u t s"), (2L, "x y z w v u t s"),
                 (3L, "p q r m n o k j")).toDF("id", "t")
      .select($"id", Dedup.minhashSignature(Dedup.shingles($"t", 2), 16).as("sig"))
    val sigs = df.orderBy($"id").as[(Long, Seq[Long])].collect()
    assert(sigs(0)._2 == sigs(1)._2)
    assert(sigs(0)._2 != sigs(2)._2)
  }

  test("empty-shingle docs are dropped by verification (zero-union guard)") {
    // shingleFrame itself never emits an empty array (sub-k docs fall
    // back to the whole text, so even "" yields one fallback shingle and
    // empty docs legitimately pair at jaccard 1.0 — pinned below). But
    // verifyJaccard is public and accepts any (id, sh) frame;
    // caller-built EMPTY arrays put a 0/0 in the jaccard division, which
    // Spark's ANSI mode throws on even for doubles (DIVIDE_BY_ZERO —
    // verified empirically: an unguarded run of this test dies with that
    // error, so the guard is load-bearing, and it must be a when()
    // branch rather than a preceding filter because predicate pushdown
    // can evaluate the division before a filter-based guard).
    val ws = Seq((1L, Seq.empty[String]), (2L, Seq.empty[String]),
                 (10L, Seq("w x", "x y")), (11L, Seq("w x", "x y"))).toDF("doc_id", "sh")
    val cands = Seq((1L, 2L), (10L, 11L), (1L, 10L)).toDF("id1", "id2")
    val got = Dedup.verifyJaccard(cands, ws, "doc_id", threshold = 0.1)
      .select($"id1", $"id2", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((10L, 11L, 1.0)), s"got $got") // 0-union pairs dropped, no throw
    // and the shipped pipeline's contract for empty TEXT: both docs carry
    // the [""] fallback shingle, so they are identical by definition
    val df = Seq((1L, ""), (2L, "   "), (10L, "w x y z w x y z")).toDF("doc_id", "text")
    val pairs = Dedup.dedupMinHashPairs(df, "doc_id", "text", threshold = 0.5)
      .select($"id1", $"id2", $"jaccard").as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((1L, 2L, 1.0)))
    graft.operators.OperatorCaches.release()
  }

  test("dedupExact keeps lowest id per duplicate group") {
    val df = Seq((10L, "same text"), (3L, "same  TEXT"), (5L, "other")).toDF("doc_id", "text")
    val kept = Dedup.dedupExact(df, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 5L))
  }

  test("simhash: identical tokens → hamming 0; near texts → small hamming") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog end"),
                 (2L, "the quick brown fox jumps over the lazy dog end"),
                 (3L, "entirely different words appear here now okay yes")).toDF("doc_id", "text")
    val pairs = Dedup.dedupSimHashPairs(df, "doc_id", "text", maxHamming = 0)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("fused MinHashSig equals the HOF and explode+agg signature forms") {
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 50)
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val fused = docs.select($"doc_id",
        graft.functions.MinHashSig.minhashSig($"sh", 16).as("sig"))
      .orderBy($"doc_id").as[(Long, Seq[Long])].collect().toSeq
    val hof = docs.select($"doc_id",
        Dedup.minhashSignature($"sh", 16).as("sig"))
      .orderBy($"doc_id").as[(Long, Seq[Long])].collect().toSeq
    val agg = Dedup.minhashSignatures(
        docs.select($"doc_id", explode($"sh").as("shingle")), "doc_id", 16)
      .orderBy($"doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(fused == hof)
    assert(fused == agg)
  }

  test("minhash LSH finds planted near-dup and verifies jaccard") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val nearDup = base.replace("kappa", "lambda")
    val df = Seq((1L, base), (2L, nearDup), (3L, "unrelated content entirely " * 10))
      .toDF("doc_id", "text")
    val pairs = Dedup.dedupMinHashPairs(df, "doc_id", "text", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0.3))
  }

  test("ngramJaccard prefix-filter path (t>=0.5) is lossless vs brute force") {
    // deterministic subset (see the capped-incremental test: an unordered
    // limit() may resolve to different row sets across the frame's
    // independent evaluations in the fast and brute paths)
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 150)
    val fast = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter($"j" >= 0.7)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(fast == brute)
  }

  test("ngramJaccardPairsWithin == ngramJaccardPairs filtered to same group, all three branches") {
    // the r17 d10 optimization: the group restriction is pushed into the
    // candidate equi-join key — results must be EXACTLY the plain
    // operator's pairs restricted to same-group endpoints (plus the
    // group value), on every dispatch branch (prefix-filter, uncapped
    // co-occurrence, capped)
    // real corpus + planted near-dups: one same-group pair (must be
    // found) and one CROSS-group pair (must be excluded by both sides —
    // proves the restriction, not just the plumbing)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val planted = Seq(
      (10001L, base, "srcA"), (10002L, base.replace("kappa", "lambda"), "srcA"),
      (10003L, base + "mu nu", "srcB"), (10004L, base + "mu nu xi", "srcC"))
      .toDF("doc_id", "text", "source")
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"source").unionByName(planted)
    val src = docs.select($"doc_id", $"source")
    for ((threshold, cap) <- Seq(
        (0.5, Dedup.NoCap), // prefix-filter branch
        (0.2, Dedup.NoCap), // uncapped co-occurrence branch
        (0.2, 1000))) {     // capped branch
      val within = Dedup.ngramJaccardPairsWithin(docs, "doc_id", "text",
          groupCol = "source", threshold = threshold, maxDocFreq = cap)
        .as[(String, Long, Long, Double)].collect().toSet
      val plain = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          threshold = threshold, maxDocFreq = cap)
        .join(src.toDF("id1", "s1"), "id1")
        .join(src.toDF("id2", "s2"), "id2")
        .filter($"s1" === $"s2")
        .select($"s1", $"id1", $"id2", $"jaccard")
        .as[(String, Long, Long, Double)].collect().toSet
      assert(within == plain,
        s"t=$threshold cap=$cap: within=${within.size} plain=${plain.size} " +
        s"diff=${(within diff plain) ++ (plain diff within)}")
      assert(within.exists(p => p._2 == 10001L && p._3 == 10002L),
        s"t=$threshold cap=$cap: planted same-group pair not found")
      assert(!within.exists(p => p._2 == 10003L && p._3 == 10004L),
        s"t=$threshold cap=$cap: cross-group pair leaked")
    }
    graft.operators.OperatorCaches.release()
  }

  test("OperatorCaches.release() drops every operator-owned cache and checkpoint") {
    import graft.operators.OperatorCaches
    val docs = Tables.load(spark, sf, "documents").limit(60)
    // start clean: other suites' caches must not pollute the assertion
    spark.sharedState.cacheManager.clearCache()
    OperatorCaches.release()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // operators that persist intermediates: shingle frame + capped index
    // (the finite cap forces the persisting branch — the default NoCap
    // low path is deliberately cache-free since r11, everything reads
    // one reused exchange; see ngramJaccardPairsFrom)
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3,
      maxDocFreq = 1000).count()
    // checkpointed fixpoint: per-round frames release inside the loop,
    // the final one via the registry
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    Dedup.connectedComponents(pairs, "a", "b").count()
    // k-means corpus persist
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    Similarity.kmeansFit(emb, k = 2, iters = 1)._2.count()
    assert(OperatorCaches.trackedCount > 0)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    val n = OperatorCaches.release()
    assert(n >= 3, s"expected at least 3 tracked releases, got $n")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("OperatorCaches.scoped: interleaved pipelines release independently") {
    import graft.operators.OperatorCaches
    val docs = Tables.load(spark, sf, "documents").limit(40)
    // start clean
    spark.sharedState.cacheManager.clearCache()
    OperatorCaches.release()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // two pipelines built interleaved, each in its own scope — over
    // DIFFERENT inputs, so the CacheManager can't dedupe their plans into
    // shared cache entries (identical plans share one entry; unpersisting
    // it from either side would drop both)
    val (pairsA, scopeA) = OperatorCaches.scoped {
      // finite cap: the persisting branch (the NoCap low path is
      // cache-free since r11)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.3,
        maxDocFreq = 1000)
    }
    val (pairsB, scopeB) = OperatorCaches.scoped {
      Dedup.ngramJaccardPairs(docs.filter($"doc_id" % 2 === 0),
        "doc_id", "text", threshold = 0.7)
    }
    pairsA.count(); pairsB.count()
    assert(scopeA.trackedCount > 0 && scopeB.trackedCount > 0)
    // scoped registrations never land in the global registry
    assert(OperatorCaches.trackedCount == 0)
    val allCached = spark.sparkContext.getPersistentRDDs.size
    // releasing A leaves B's storage untouched and B still answers
    scopeA.release()
    assert(scopeA.trackedCount == 0)
    val afterA = spark.sparkContext.getPersistentRDDs.size
    assert(afterA > 0 && afterA < allCached,
      s"scopeA.release() should drop only A's caches: $allCached -> $afterA")
    pairsB.count() // B's caches intact — no recompute failure, same result path
    scopeB.release()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("ngramJaccard builders run ZERO Spark jobs at construction time") {
    // r10 verdict #1: the old cap-skip guard counted the corpus at
    // operator-construction time — a driver-blocking full pass a 100 TB
    // pipeline would pay per ingest batch. The NoCap sentinel decides
    // capped-vs-uncapped from the argument alone; this listener pins
    // that NO path (default/NoCap/finite-cap, batch or incremental)
    // launches a job before the returned frame is executed.
    // Every job the SPEC launches runs inside a named job group
    // ("spec-setup" before registration, "spec-sentinel" for the
    // bus-flush); constructions run with the group CLEARED, so a job
    // launched from inside a builder shows up group-less — counted as
    // rogue regardless of when the async bus delivers its event. Robust
    // to multi-job actions and to pre-registration stragglers.
    val rogue = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val sentinels = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val grp = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        // the sentinel gets its OWN group: waiting on a group shared with
        // the pre-registration setup job would let a straggler setup
        // event satisfy the wait before a rogue construction event is
        // delivered (r11 review pass)
        if (grp == "spec-sentinel") sentinels.incrementAndGet()
        else if (grp != "spec-setup") rogue.add(js.jobId)
      }
    }
    val sc = spark.sparkContext
    val docs = Tables.load(spark, sf, "documents").limit(50)
      .select($"doc_id", $"text")
    val emb = Tables.load(spark, sf, "embeddings").limit(20)
    sc.setJobGroup("spec-setup", "zero-jobs spec setup")
    // materialize lineage + first-touch costs (parquet schema inference
    // can itself launch a job) outside the assertion window
    docs.count(); emb.count()
    sc.addSparkListener(listener)
    try {
      sc.clearJobGroup()
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.7)
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1,
        maxDocFreq = 10)
      Dedup.ngramJaccardIncremental(
        docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
        "doc_id", "text", threshold = 0.1)
      Dedup.ngramJaccardIncremental(
        docs.filter($"doc_id" % 2 === 0), docs.filter($"doc_id" % 2 === 1),
        "doc_id", "text", threshold = 0.1, maxDocFreq = 10)
      // the guarantee is family-wide: EVERY pipeline builder declares its
      // plan without touching the data (kmeansFit/ivfFit are excluded by
      // design — fitting IS computation)
      Dedup.dedupExact(docs, "doc_id", "text")
      Dedup.exactDupStats(docs, "text")
      Dedup.dedupMinHashPairs(docs, "doc_id", "text", threshold = 0.5)
      Dedup.dedupSimHashPairs(docs, "doc_id", "text")
      Dedup.cosineNearDupPairs(emb, "vec_id", "embedding", 0.5)
      Dedup.cosineNearDupLSH(emb, "vec_id", "embedding",
        threshold = 0.5, dim = 64)
      Dedup.cosineNearDupLSHBanded(emb, "vec_id", "embedding",
        threshold = 0.5, dim = 64,
        params = Dedup.hyperplaneLshParamsFor(2000L, 0.5))
      Dedup.contamination(docs, docs.limit(5), "doc_id", "text")
      // flush the (ordered) bus: once the post-construction sentinel's
      // JobStart is delivered, any construction-time JobStart would have
      // been delivered before it — and only THIS group's event satisfies
      // the wait, so a straggler setup event can't end it early
      sc.setJobGroup("spec-sentinel", "zero-jobs spec sentinel")
      spark.range(1).count()
      sc.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (sentinels.get() < 1 && System.nanoTime() < deadline)
        Thread.sleep(10)
      assert(sentinels.get() >= 1, "listener never saw the sentinel job")
      assert(rogue.isEmpty,
        s"operator construction launched Spark job(s): ids ${rogue}")
    } finally {
      sc.removeSparkListener(listener)
      graft.operators.OperatorCaches.release()
    }
  }

  test("minHashParamsFor: boundary recall >= floor across thresholds, budget respected") {
    for (t <- Seq(0.1, 0.2, 0.3, 0.5, 0.7, 0.8, 0.9); floor <- Seq(0.9, 0.95)) {
      val (b, r) = Dedup.minHashParamsFor(t, floor)
      val predicted = 1 - math.pow(1 - math.pow(t, r), b.toDouble)
      assert(predicted >= floor, s"t=$t floor=$floor b=$b r=$r: $predicted")
      assert(b * r <= 256 && b >= 1 && r >= 1)
    }
    // the documented restriction of the DEFAULT 64/16 banding: 0.95
    // recall holds at j=0.8 (the proven d02 regime), not at j=0.6
    assert(1 - math.pow(1 - math.pow(0.8, 4), 16.0) >= 0.95)
    assert(1 - math.pow(1 - math.pow(0.6, 4), 16.0) < 0.95)
    // an unreachable floor fails fast, never silently under-delivers
    intercept[IllegalArgumentException](
      Dedup.minHashParamsFor(0.05, 0.95, maxHashes = 16))
  }

  test("minhash boundary recall: auto sizing >= 0.9 where the default banding collapses") {
    // 60 synthetic pairs engineered AT the t=0.2 boundary: docs of 40
    // words sharing a 16-word prefix → 14 shared 3-gram shingles of ~38
    // per doc → jaccard ≈ 0.226. The r13 verdict's computed decay, made
    // measurable: the default 64/16 banding finds such a pair w.p.
    // 1−(1−j⁴)¹⁶ ≈ 4%, the boundary-sized banding (74 bands of 2) w.p.
    // ≈ 98%. Hashing is seed-fixed, so both measurements are
    // deterministic.
    val docs = (0 until 60).flatMap { i =>
      val shared = (0 until 16).map(k => s"p${i}s$k").mkString(" ")
      val ua = (0 until 24).map(k => s"p${i}a$k").mkString(" ")
      val ub = (0 until 24).map(k => s"p${i}b$k").mkString(" ")
      Seq((i.toLong * 2, s"$shared $ua"), (i.toLong * 2 + 1, s"$shared $ub"))
    }.toDF("doc_id", "text")
    val sh = Dedup.shingleFrame(docs, "doc_id", "text", k = 3).persist()
    try {
      val exact = Dedup.ngramJaccardPairsFrom(sh, "doc_id", threshold = 0.2,
          maxDocFreq = Int.MaxValue)
        .select($"id1", $"id2").as[(Long, Long)].collect().toSet
      assert(exact.size == 60, s"engineered pairs off: ${exact.size}")
      def recallOf(bands: Int, rows: Int): Double = {
        val found = Dedup.dedupMinHashPairsFrom(sh, "doc_id",
            numHashes = bands * rows, bands = bands, threshold = 0.2)
          .select($"id1", $"id2").as[(Long, Long)].collect().toSet
        assert(found.subsetOf(exact)) // exact-verified: no false positives
        (found & exact).size.toDouble / exact.size
      }
      val (autoBands, autoRows) = Dedup.minHashParamsFor(0.2, 0.95)
      val autoRecall = recallOf(autoBands, autoRows)
      val defaultRecall = recallOf(16, 4)
      assert(autoRecall >= 0.9,
        s"auto ($autoBands x $autoRows) measured $autoRecall")
      assert(defaultRecall <= 0.5,
        s"default 16x4 should collapse at the boundary, measured $defaultRecall")
    } finally { sh.unpersist(); () }
  }

  test("dedupSimHashPairs: over-occupancy bucket drops silently; stated-size guard refuses") {
    // (a) the structural defect the r14 bound guards (r13 verdict #2):
    // a bucket past the collector cap is dropped WHOLE — identical docs
    // produce ZERO pairs at maxBucket=10 even though all 435 pairs are
    // true dups. This is the silent candidate loss the 64-bit band
    // space hits at ~6.5×10⁸ docs corpus-wide.
    val dups = spark.range(30)
      .select($"id".as("doc_id"), lit("the same text repeated here").as("text"))
    assert(Dedup.dedupSimHashPairs(dups, "doc_id", "text",
      maxHamming = 3, maxBucket = 10).count() == 0)
    // an adequate cap emits every pair — the drop above was the cap
    assert(Dedup.dedupSimHashPairs(dups, "doc_id", "text",
      maxHamming = 3, maxBucket = 100).count() == 435)
    // (b) fail-fast: a stated corpus size past the saturation bound
    val bound = Dedup.simHashSaturationDocs(10000)
    assert(bound == 10000L << 16)
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupSimHashPairs(dups, "doc_id", "text",
        nRows = Some(bound + 1))
    }
    assert(e.getMessage.contains("dedupSimHashPairsWide"))
    // at the bound: accepted (construction only — no job runs)
    Dedup.dedupSimHashPairs(dups, "doc_id", "text", nRows = Some(bound))
  }

  test("simHashBandsFor: occupancy widens bands monotonically, never below 4") {
    assert(Dedup.simHashBandsFor(1000L) == (8, 16))
    assert(Dedup.simHashBandsFor(2000000L) == (8, 16))
    assert(Dedup.simHashBandsFor(6000000000L) == (4, 28))
    assert(Dedup.simHashBandsFor(Long.MaxValue) == (4, 32))
    val seq = (10 to 45).map(e => Dedup.simHashBandsFor(1L << e))
    for (i <- 1 until seq.size) {
      assert(seq(i)._2 >= seq(i - 1)._2, s"bits shrank at step $i: $seq")
      assert(seq(i)._1 <= seq(i - 1)._1, s"bands grew at step $i: $seq")
      assert(seq(i)._1 >= 4)
    }
  }

  test("dedupSimHashPairsWide: exact 128-bit hamming, pigeonhole radius complete, lo word = SimHash64") {
    import graft.functions.{SimHash128, SimHash64, TokenizeWords}
    val base = Tables.load(spark, sf, "documents").filter($"doc_id" < 300)
      .select($"doc_id", $"text")
    // plant an exact dup so the guaranteed radius is non-vacuous
    val docs = base.union(base.filter($"doc_id" === 1)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")).persist()
    try {
      val found = Dedup.dedupSimHashPairsWide(docs, "doc_id", "text",
          nRows = 301L, maxHamming = 16)
        .as[(Long, Long, Int)].collect()
      val sigs = docs.select($"doc_id",
        SimHash128.simhash128(TokenizeWords.tokenizeWords($"text")).as("sig"))
      val brute = sigs.select($"doc_id".as("id1"), $"sig".as("s1"))
        .join(sigs.select($"doc_id".as("id2"), $"sig".as("s2")),
          col("id1") < col("id2"))
        .select($"id1", $"id2",
          (bit_count(element_at($"s1", 1).bitwiseXOR(element_at($"s2", 1))) +
           bit_count(element_at($"s1", 2).bitwiseXOR(element_at($"s2", 2))))
            .as("hamming"))
        .as[(Long, Long, Int)].collect()
      val bruteMap = brute.map(t => (t._1, t._2) -> t._3).toMap
      // exact: every emitted pair's hamming matches brute, bound holds
      assert(found.nonEmpty)
      found.foreach { case (a, b, h) =>
        assert(bruteMap((a, b)) == h && h <= 16, s"($a,$b,$h)")
      }
      // pigeonhole: at n=301 → (8 bands, 16 bits), hamming ≤ 7 shares a
      // band by construction and MUST be emitted (the planted dup at 0)
      val mustFind = brute.filter(_._3 <= 7).map(t => (t._1, t._2)).toSet
      val foundSet = found.map(t => (t._1, t._2)).toSet
      assert(mustFind.contains((1L, 100001L)))
      assert(mustFind.subsetOf(foundSet),
        s"missed ${(mustFind -- foundSet).size} guaranteed pairs")
      // embedding contract: word 0 of the wide fingerprint IS SimHash64
      val both = docs.select(
        SimHash64.simhash64(TokenizeWords.tokenizeWords($"text")).as("s64"),
        element_at(SimHash128.simhash128(
          TokenizeWords.tokenizeWords($"text")), 1).as("lo"))
        .as[(Long, Long)].collect()
      assert(both.nonEmpty && both.forall { case (a, b) => a == b })
    } finally { docs.unpersist(); () }
  }

  test("ngramJaccardPairsFrom: maxDocFreq cap drops high-DF pairs; MaxValue is exact") {
    // Four docs whose ONLY overlap is one shingle with doc-frequency 4:
    // every pair has jaccard 1/3. A cap below 4 drops that shingle from
    // the inverted index and silently loses all six pairs — exactly the
    // divergence d02_minhash_gate avoids by recomputing its exact
    // reference with maxDocFreq = Int.MaxValue (the DuckDB CTE is
    // uncapped). This pins the semantics the gate relies on.
    val sh = Seq(
      (1L, Seq("common sh ingle", "only one")),
      (2L, Seq("common sh ingle", "only two")),
      (3L, Seq("common sh ingle", "only three")),
      (4L, Seq("common sh ingle", "only four"))).toDF("doc_id", "sh")
    val capped = Dedup.ngramJaccardPairsFrom(sh, "doc_id",
      threshold = 0.2, maxDocFreq = 3)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(capped.isEmpty)
    val exact = Dedup.ngramJaccardPairsFrom(sh, "doc_id",
      threshold = 0.2, maxDocFreq = Int.MaxValue)
      .as[(Long, Long, Double)].collect()
    assert(exact.length == 6 && exact.forall(_._3 == 0.3333)) // round(j, 4)
  }

  test("ngramJaccard matches brute-force on the documents table") {
    // deterministic subset — fast and brute evaluate the frame independently
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 100)
    val fast = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.1)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    // brute force via cross join
    val sh = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(array_union(col("a.sh"), col("b.sh"))).cast("double")).as("j"))
      .filter($"j" >= 0.1)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(fast == brute)
  }

  test("multi-consumer builders fail fast on non-deterministic input (shared contract)") {
    val docs = Seq((1L, "a b c d e"), (2L, "b c d e f")).toDF("doc_id", "text")
    // rand-sampled frame: Catalyst marks Rand non-deterministic even
    // with a fixed seed — each evaluation of the lineage can keep a
    // different row set
    val tainted = docs.filter(rand(42) >= 0.0)
    val builders: Seq[(String, org.apache.spark.sql.DataFrame => Any)] = Seq(
      "tfidfTopTerms" -> (d => TextOps.tfidfTopTerms(d, "doc_id", "text", 2)),
      "dedupMinHashPairsFrom" -> (d =>
        Dedup.dedupMinHashPairsFrom(Dedup.shingleFrame(d, "doc_id", "text"), "doc_id")),
      "ngramJaccardPairsFrom" -> (d =>
        Dedup.ngramJaccardPairsFrom(Dedup.shingleFrame(d, "doc_id", "text"), "doc_id")),
      "cosineNearDupLSH" -> (d =>
        Dedup.cosineNearDupLSH(d.select($"doc_id", array(lit(1.0f)).as("v")),
          "doc_id", "v", 0.5, dim = 1)),
      "cosineNearDupLSHBanded" -> (d =>
        Dedup.cosineNearDupLSHBanded(d.select($"doc_id", array(lit(1.0f)).as("v")),
          "doc_id", "v", 0.5, dim = 1,
          params = Dedup.hyperplaneLshParamsFor(100L, 0.5))),
      "ngramJaccardIncremental" -> (d =>
        Dedup.ngramJaccardIncremental(docs, d, "doc_id", "text")),
      "connectedComponents" -> (d =>
        Dedup.connectedComponents(d.select($"doc_id".as("a"), ($"doc_id" + 1).as("b")),
          "a", "b")))
    for ((name, build) <- builders) {
      val e = intercept[IllegalArgumentException](build(tainted))
      assert(e.getMessage.contains("non-deterministic"), s"$name: ${e.getMessage}")
    }
    // current_timestamp is rejected too: Catalyst flags it deterministic
    // (pinned per execution), but multi-consumer builders may span
    // several executions, each pinning a different instant
    val timeTainted = docs.filter($"doc_id" <
      unix_timestamp(current_timestamp()))
    val e = intercept[IllegalArgumentException](
      TextOps.tfidfTopTerms(timeTainted, "doc_id", "text", 2))
    assert(e.getMessage.contains("non-deterministic"))
    // rand() buried in a SCALAR SUBQUERY: Catalyst derives the subquery
    // expression's determinism from its outer-reference children only,
    // so a flat expression walk never sees it — the contract must
    // recurse into subquery plans (r12 review pass)
    docs.createOrReplaceTempView("ic_docs")
    val subqueryTainted = spark.sql(
      "SELECT * FROM ic_docs WHERE doc_id <= " +
        "(SELECT max(doc_id) FROM ic_docs WHERE rand(7) >= 0.0)")
    val es = intercept[IllegalArgumentException](
      TextOps.tfidfTopTerms(subqueryTainted, "doc_id", "text", 2))
    assert(es.getMessage.contains("non-deterministic"))
    // the documented remedy is accepted: a persisted random frame
    // materializes once, so the consumers agree by construction
    val persisted = tainted.persist()
    try {
      val out = TextOps.tfidfTopTerms(persisted, "doc_id", "text", 2)
      assert(out.count() > 0)
    } finally { persisted.unpersist(); () }
  }

  test("minHashIncremental == full LSH pair set restricted to batch-touching pairs") {
    // the adoption contract (r14 verdict #5): the incremental form must
    // change WHAT is compared (only batch-touching pairs), never what
    // is found — same banding, same bucket capping, same verification,
    // so the equality is deterministic, both directions
    val docs = Tables.load(spark, sf, "documents")
    val inc = Dedup.minHashIncremental(
        docs.filter($"doc_id" < 300), docs.filter($"doc_id" >= 300),
        "doc_id", "text", k = 3, threshold = 0.5)
      .select($"id1", $"id2", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.dedupMinHashPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.5)
      .filter($"id2" >= 300)
      .select($"id1", $"id2", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full, s"incremental=${inc.size} full-restricted=${full.size}")
    assert(inc.nonEmpty, "vacuous equivalence — corpus lost its dups")
    // corpus-internal pairs never generated: nothing with both ids old
    assert(!inc.exists { case (a, b, _) => a < 300 && b < 300 })
  }

  test("minHashIncremental: re-delivered ids don't double-count shingles") {
    // at-least-once ingest: a doc present in BOTH corpus and batch must
    // behave as one doc (batch copy supersedes) — no self-pairs, no
    // jaccard > 1, and pairs involving it computed from single arrays
    val docs = Tables.load(spark, sf, "documents")
    val out = Dedup.minHashIncremental(
        docs.filter($"doc_id" < 350), docs.filter($"doc_id" >= 300),
        "doc_id", "text", k = 3, threshold = 0.5)
      .select($"id1", $"id2", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(out.forall { case (a, b, j) => a < b && j <= 1.0 })
    assert(out.length == out.map(p => (p._1, p._2)).distinct.length)
  }

  test("cosineLshIncremental == full banded LSH restricted to batch-touching pairs") {
    val emb = Tables.load(spark, sf, "embeddings")
    val params = Dedup.hyperplaneLshParamsFor(500L, 0.4)
    val inc = Dedup.cosineLshIncremental(
        emb.filter($"vec_id" < 300), emb.filter($"vec_id" >= 300),
        "vec_id", "embedding", threshold = 0.4, dim = 64, params = params)
      .select($"id1", $"id2", $"cosine")
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.cosineNearDupLSHBanded(emb, "vec_id", "embedding",
        threshold = 0.4, dim = 64, params = params)
      .filter($"id2" >= 300)
      .select($"id1", $"id2", $"cosine")
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full, s"incremental=${inc.size} full-restricted=${full.size}")
    assert(inc.nonEmpty, "vacuous equivalence — corpus lost its near-dups")
    assert(!inc.exists { case (a, b, _) => a < 300 && b < 300 })
  }

  test("simHashIncremental == full SimHash pair set restricted to batch-touching pairs") {
    // the fingerprint member of the incremental family: identical 4×16
    // banding + capping on both forms makes the equality deterministic
    // below saturation, and (id1, id2, HAMMING) equality also pins the
    // distance values, not just the pair set
    val docs = Tables.load(spark, sf, "documents")
    val inc = Dedup.simHashIncremental(
        docs.filter($"doc_id" < 300), docs.filter($"doc_id" >= 300),
        "doc_id", "text", maxHamming = 8)
      .select($"id1", $"id2", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    val full = Dedup.dedupSimHashPairs(docs, "doc_id", "text",
        maxHamming = 8)
      .filter($"id2" >= 300)
      .select($"id1", $"id2", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(inc == full, s"incremental=${inc.size} full-restricted=${full.size}")
    assert(inc.nonEmpty, "vacuous equivalence — corpus lost its dups")
    assert(!inc.exists { case (a, b, _) => a < 300 && b < 300 })
  }

  test("simHashIncremental: re-delivered ids supersede and emit no dup rows") {
    // at-least-once ingest with an overlapping range: the batch copy
    // supersedes, no self-pairs, ordered ids, one row per pair
    val docs = Tables.load(spark, sf, "documents")
    val out = Dedup.simHashIncremental(
        docs.filter($"doc_id" < 350), docs.filter($"doc_id" >= 300),
        "doc_id", "text", maxHamming = 8)
      .select($"id1", $"id2", $"hamming")
      .as[(Long, Long, Int)].collect()
    assert(out.forall { case (a, b, h) => a < b && h >= 0 && h <= 8 })
    assert(out.length == out.map(p => (p._1, p._2)).distinct.length)
  }

  test("simHashIncremental fails fast past the saturation bound") {
    val docs = Tables.load(spark, sf, "documents")
    val ex = intercept[IllegalArgumentException] {
      Dedup.simHashIncremental(
        docs.filter($"doc_id" < 300), docs.filter($"doc_id" >= 300),
        "doc_id", "text", nRows = Some(Long.MaxValue))
    }
    assert(ex.getMessage.contains("saturation"))
  }

  test("recall gates fail loudly on a corpus with zero exact pairs (no vacuous pass)") {
    // r14 verdict #2: the three older recall gates used to auto-pass on
    // an empty exact set (`ne === 0 ||`), so a corpus regression would
    // flip them to silent green. Build a corpus with NO exact pairs —
    // per-doc-unique words (disjoint shingle sets) and one-hot
    // embeddings (pairwise cosine 0) — and pin that recall_ge_90pct and
    // exact_pairs_nonzero both read 0, i.e. the driver would see a loud
    // mismatch against the oracle's constant 1s, not a pass.
    val dir = java.nio.file.Files.createTempDirectory("graft_nopairs").toString
    (0L until 64L).map(i =>
        (i, (0 until 10).map(w => s"uniq${i}w$w").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0L until 64L).map { i =>
      (i, Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f).toSeq)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    for (gate <- Seq("d02_minhash_gate", "d02_recall_gate", "d06_recall_gate")) {
      val m = SparkEntry.queries(gate)(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m("recall_ge_90pct") == 0L,
        s"$gate must NOT pass recall vacuously on an empty exact set: $m")
      assert(m("exact_pairs_nonzero") == 0L,
        s"$gate must flag the empty exact set: $m")
      assert(m.get("exact_pairs").forall(_ == 0L) &&
        m.get("false_positives").forall(_ == 0L), s"$gate: $m")
      graft.operators.OperatorCaches.release()
    }
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot and cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(2.0f, 3.0f))).toDF("u", "v")
    val d = df.select(Similarity.dot($"u", $"v").as("d")).as[Double].head()
    assert(d == 8.0)
    val c = df.select(Similarity.cosine($"u", $"v").as("c")).as[Double].head()
    assert(math.abs(c - 0.99227787671) < 1e-9)
  }

  test("vector expressions bind to the physical element width") {
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    // a value exactly representable in float: float-widened and
    // double-native paths must agree bit-for-bit
    val dfF = Seq((Seq(1.5f, -2.25f, 3.0f), Seq(0.5f, 4.0f, -1.0f))).toDF("u", "v")
    val dfD = dfF.select($"u".cast(ArrayType(DoubleType)).as("u"),
      $"v".cast(ArrayType(DoubleType)).as("v"))
    val ff = dfF.select(Similarity.dot($"u", $"v")).as[Double].head()
    val dd = dfD.select(Similarity.dot($"u", $"v")).as[Double].head()
    // mixed widths (one side float, one double) also agree
    val fd = dfF.select($"u").crossJoin(dfD.select($"v"))
      .select(Similarity.dot($"u", $"v")).as[Double].head()
    assert(ff == dd && ff == fd && ff == 1.5 * 0.5 + -2.25 * 4.0 + 3.0 * -1.0)
    // a double NOT representable in float must be read at full precision
    val prec = Seq((Seq(1.0000000001d), Seq(1.0d))).toDF("u", "v")
      .select(Similarity.dot($"u", $"v")).as[Double].head()
    assert(prec == 1.0000000001d, s"double[] input was truncated: $prec")
    // hyperplane signatures: identical across widths of the same values
    import graft.functions.HyperplaneSig
    val sF = dfF.select(HyperplaneSig.sig($"u", 3, 16).as("s")).as[Long].head()
    val sD = dfD.select(HyperplaneSig.sig($"u", 3, 16).as("s")).as[Long].head()
    assert(sF == sD)
  }

  test("vector expressions reject non-float/double arrays at analysis") {
    import graft.functions.HyperplaneSig
    val bad = Seq((Seq(1, 2, 3), Seq(4, 5, 6))).toDF("u", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(Similarity.dot($"u", $"v")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(HyperplaneSig.sig($"u", 3, 16)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(HyperplaneSig.bandBuckets($"u", 3, 4, 4)).collect()
    }
  }

  test("HyperplaneBandBuckets matches HyperplaneSig banding bit-for-bit") {
    // compat contract (doc-pinned): at the same (dim, bands·rowsPerBand,
    // seed), band b's bucket equals the one-long signature's bits
    // [b·rowsPerBand, (b+1)·rowsPerBand) — the two expressions draw the
    // same planes in the same order, so the banded form is a drop-in
    // replacement with no 63-bit budget.
    import graft.functions.HyperplaneSig
    val rows = Tables.load(spark, sf, "embeddings").limit(64)
      .select($"vec_id",
        HyperplaneSig.sig($"embedding", 64, 32, 7L).as("sig"),
        HyperplaneSig.bandBuckets($"embedding", 64, 4, 8, 7L).as("bb"))
      .as[(Long, Long, Seq[Long])].collect()
    assert(rows.length == 64)
    for ((_, sig, bb) <- rows) {
      assert(bb.length == 4)
      for (b <- 0 until 4)
        assert(bb(b) == ((sig >>> (b * 8)) & 0xffL))
    }
    // wide mode: more than 64 total bits (the whole point) — 10 bands of
    // 20 rows = 200 planes; buckets stay within the band width
    val wide = Tables.load(spark, sf, "embeddings").limit(8)
      .select(HyperplaneSig.bandBuckets($"embedding", 64, 10, 20, 7L).as("bb"))
      .as[Seq[Long]].collect()
    assert(wide.forall(bb => bb.length == 10 &&
      bb.forall(b => b >= 0 && b < (1L << 20))))
  }

  test("bruteForceTopK: k results per query, self excluded, rank ordered") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" < 3).select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val res = Similarity.bruteForceTopK(emb, q, 4).collect()
    assert(res.length == 12)
    val byQ = res.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4))
      assert(!rows.exists(_.getLong(1) == qid))
      val cos = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ivfTopK at the production sizing holds the recall floor while pruning") {
    // r14 verdict lead task: the suite pin raised from the old 0.4
    // sanity bar to the sizer's gate floor — ivfParamsFor picks
    // (nCells, nprobe) for a 0.95 design floor and the measured recall
    // of that EXACT configuration must clear 0.9 (finite-sample slack),
    // with real pruning (nprobe < nCells, else the index is pointless).
    val emb = Tables.load(spark, sf, "embeddings")
    val n = emb.count()
    val params = Similarity.ivfParamsFor(n, k = 5, recallFloor = 0.95)
    assert(!params.exhaustive,
      s"sizer degenerated to brute force at n=$n: $params")
    assert(params.nprobe < params.nCells)
    // spread queries (ids are shard-ordered; a prefix probes one region)
    val q = emb.filter(pmod($"vec_id", lit(10)) === 0)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val brute = Similarity.bruteForceTopK(emb, q, 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, 5,
        nCells = params.nCells, nprobe = params.nprobe)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"IVF recall $recall below the 0.9 gate floor " +
      s"at production params $params")
  }

  test("ivfParamsFor: floor reachable, monotone in floor, honest flags") {
    // model floor line: higher floor → more probes; tiny corpora can
    // hit the exhaustive point and must SAY so rather than under-probe
    val p95 = Similarity.ivfParamsFor(1000000L, k = 10, recallFloor = 0.95)
    val p50 = Similarity.ivfParamsFor(1000000L, k = 10, recallFloor = 0.5)
    assert(p95.nCells == 1000 && p50.nCells == 1000)
    assert(p95.nprobe > p50.nprobe)
    assert(!p95.exhaustive && p95.nprobe < p95.nCells)
    assert(p95.predictedRecall >= 0.95 && p50.predictedRecall >= 0.5)
    // k floor: nprobe cells must be able to hold k candidates on average
    val tiny = Similarity.ivfParamsFor(100L, k = 50, recallFloor = 0.5)
    assert(tiny.nprobe * (100.0 / tiny.nCells) >= 50.0 - 1e-9)
    // nprobe = nCells is exact search — the flag must report it
    val exhaustive = Similarity.ivfParamsFor(4L, k = 4, recallFloor = 0.95)
    assert(exhaustive.exhaustive)
  }

  test("estimateIvfAlpha: clustered corpora measure far larger alpha than uniform ones") {
    // the r16 sample calibrator behind ivfParamsFor's alpha knob: on
    // the shipped near-uniform embeddings the estimate sits in the
    // measured 2-8 band; on a planted-cluster fixture (8 tight
    // clusters) a small probe fraction already captures each query's
    // neighborhood, so the implied alpha is far larger. Deterministic:
    // id-spread sampling, Lloyd init by first-K ids.
    val emb = Tables.load(spark, sf, "embeddings")
    val aUniform = Similarity.estimateIvfAlpha(emb, "vec_id", "embedding",
      k = 5, nQueries = 20, sampleSize = 500L, probeFraction = 0.2)
    assert(aUniform >= 1.0 && aUniform <= 64.0, s"aUniform=$aUniform")
    val clustered = (0 until 256).map { i =>
      (i.toLong, Array.tabulate(64) { d =>
        (if (d == i % 8) 1.0f else 0.0f) +
          (if (d == (i * 7) % 64) 0.05f else 0.0f)
      })
    }.toDF("vec_id", "embedding")
    val aClustered = Similarity.estimateIvfAlpha(clustered, "vec_id",
      "embedding", k = 5, nQueries = 20, sampleSize = 500L,
      probeFraction = 0.2)
    assert(aClustered >= 8.0 && aClustered > aUniform,
      s"planted clusters must measure a large alpha: clustered=" +
      s"$aClustered uniform=$aUniform")
  }

  test("ivfParamsForCorpus: measured alpha sizes a cheaper config that still holds the floor") {
    // the closed calibration loop (r16 verdict #7): on a planted-
    // cluster corpus, estimateIvfAlpha → halved → ivfParamsFor must
    // produce a sizing that (a) prunes far harder than the uniform-
    // priced default and (b) still clears the floor when the EXACT
    // sized configuration runs end-to-end against brute force.
    val clustered = (0 until 1024).map { i =>
      (i.toLong, Array.tabulate(64) { d =>
        (if (d == i % 16) 1.0f else 0.0f) +
          (if (d == (i * 7) % 64) 0.05f else 0.0f)
      })
    }.toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = clustered.count()
      val sized = Similarity.ivfParamsForCorpus(clustered, "vec_id",
        "embedding", n, k = 5, recallFloor = 0.95, sampleSize = 600L)
      val default = Similarity.ivfParamsFor(n, k = 5, recallFloor = 0.95)
      assert(sized.nCells == default.nCells)
      assert(sized.scanFraction <= default.scanFraction / 3.0,
        s"measured alpha should prune far harder than the uniform " +
        s"price here: sized=$sized default=$default")
      // run the sized configuration itself, not a proxy
      val q = clustered.filter(pmod($"vec_id", lit(40)) === 0)
        .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
      val brute = Similarity.bruteForceTopK(clustered, q, 5)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      val ivf = Similarity.ivfTopK(clustered, q, 5,
          nCells = sized.nCells, nprobe = sized.nprobe)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (brute & ivf).size.toDouble / brute.size
      assert(recall >= 0.9,
        s"sized config missed the gate floor: recall=$recall at $sized")
    } finally { clustered.unpersist(); () }
  }

  test("ivfTopK: fitted cells are non-degenerate; explicit-centroid path matches") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val (cents, assign) = Similarity.kmeansFit(emb, k = 8, iters = 3)
    assert(assign.select(countDistinct($"cid")).head().getLong(0) >= 4,
      "fitted quantizer must spread the corpus over multiple cells")
    // passing fitted centroids explicitly (the production shape: train
    // once, reuse per batch) must agree with the frame-based entry point
    val a = Similarity.ivfTopK(emb, q, 5, nCells = 8, nprobe = 4,
      centroids = Some(cents)).collect().toSet
    val b = Similarity.ivfTopKWithCells(emb, q,
      cents.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell_id", "cell_vec"),
      5, nprobe = 4).collect().toSet
    assert(a == b, "explicit-centroid paths must produce identical results")
  }

  test("kmeansFit: Lloyd iterations improve the spherical objective monotonically") {
    val emb = Tables.load(spark, sf, "embeddings")
    def objective(iters: Int): Double = {
      val (_, assigned) = Similarity.kmeansFit(emb, k = 8, iters = iters)
      assert(assigned.count() == emb.count(), "every vector assigned exactly once")
      assigned.agg(avg($"cosine")).head().getDouble(0)
    }
    val (o0, o1, o3) = (objective(0), objective(1), objective(3))
    val eps = 1e-9 // float→double roundtrip noise
    assert(o1 >= o0 - eps, s"iteration 1 must not regress: $o0 -> $o1")
    assert(o3 >= o1 - eps, s"iteration 3 must not regress: $o1 -> $o3")
    assert(o3 > o0, s"three iterations should strictly improve on init: $o0 -> $o3")
  }

  // r18: the narrow-map argmax assignment (CosineArgmaxK, zero exchanges)
  // must be BIT-IDENTICAL to the max_by partial-agg shape it replaced —
  // fitted centroids (every double), assignments, and unrounded cosines.
  // Exercised over multiple iterations so any drift would compound and
  // surface; ties and NaN ordering are pinned by CosineArgmaxK's use of
  // the same SQL double ordering max_by compares with.
  test("kmeansFit: narrow argmax assignment is bit-identical to the max_by shape") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (cN, aN) = Similarity.kmeansFit(emb, k = 8, iters = 3,
      narrowAssign = true)
    val (cB, aB) = Similarity.kmeansFit(emb, k = 8, iters = 3,
      narrowAssign = false)
    assert(cN.size == cB.size, "centroid count must match")
    cN.zip(cB).zipWithIndex.foreach { case ((n, b), i) =>
      assert(java.util.Arrays.equals(n, b), s"centroid $i diverged")
    }
    val rowsN = aN.orderBy($"vec_id").collect().toSeq
    val rowsB = aB.orderBy($"vec_id").collect().toSeq
    assert(rowsN == rowsB, "assignments (id, cid, cosine) must be identical")
  }

  // r18: the literal-centroid IVF route (zero-exchange corpus cell
  // assignment) must return EXACTLY what the frame route returns —
  // full rows including cosine and rank. A duplicated centroid forces
  // assignment-level ties, exercising the rounded-argmax lowest-cell_id
  // tie-break both routes must share.
  test("ivfTopKWithCentroids matches ivfTopKWithCells exactly, ties included") {
    val emb = Tables.load(spark, sf, "embeddings")
    val (cents0, _) = Similarity.kmeansFit(emb, k = 6, iters = 2)
    val cents = cents0 :+ cents0.head // duplicate cell → guaranteed ties
    val centFrame = cents.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell_id", "cell_vec")
    val q = emb.filter($"vec_id" < 6)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val a = Similarity.ivfTopKWithCells(emb, q, centFrame, k = 5, nprobe = 3)
      .collect().toSet
    val b = Similarity.ivfTopKWithCentroids(emb, q, cents, k = 5, nprobe = 3)
      .collect().toSet
    assert(a == b, "literal-centroid route must equal the frame route row-for-row")
    assert(a.nonEmpty)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize: schema has binary payload + typed metadata") {
    val m = Multimodal.synthesize(Tables.load(spark, sf, "documents"))
    val sc = m.schema
    assert(sc("bytes").dataType == org.apache.spark.sql.types.BinaryType)
    assert(sc("width").dataType == org.apache.spark.sql.types.IntegerType)
    assert(m.count() > 0)
  }

  test("readBinaryDir ingests opaque files with payloads intact") {
    val m = Multimodal.readBinaryDir(spark, sf, "*.parquet")
    assert(m.count() == Tables.all.size) // one blob per table file
    val row = m.orderBy($"path").limit(1)
      .select($"n_bytes", length($"bytes").cast("long").as("blen")).head()
    assert(row.getLong(0) == row.getLong(1) && row.getLong(0) > 0)
  }

  test("extractFeatures: partition-wise stub decode, deterministic") {
    // deterministic subset — the pipeline is evaluated independently twice
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 10)
    val f1 = Multimodal.featurePipeline(spark, docs).orderBy($"media_id").collect()
    val f2 = Multimodal.featurePipeline(spark, docs).orderBy($"media_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(_.getAs[Seq[Float]]("feature").length == 8))
  }

  test("resizeStub: aspect-preserving fit, no upscale, non-images untouched") {
    import graft.operators.Multimodal.MediaRecord
    val media = Multimodal.synthesize(Tables.load(spark, sf, "documents"))
      .as[MediaRecord]
    val out = Multimodal.resizeStub(media, 100, 80).collect()
    val in = media.collect().map(m => m.media_id -> m).toMap
    // case-class == is reference equality on the Array[Byte] field
    def same(a: MediaRecord, b: MediaRecord): Boolean =
      a.media_id == b.media_id && a.kind == b.kind && a.width == b.width &&
        a.height == b.height && a.format == b.format &&
        a.duration_ms == b.duration_ms && a.bytes.sameElements(b.bytes)
    out.foreach { m =>
      val orig = in(m.media_id)
      if (orig.kind != "image") assert(same(m, orig))
      else {
        assert(m.width <= 100 && m.height <= 80, s"${m.width}x${m.height} out of bounds")
        assert(m.width <= orig.width && m.height <= orig.height, "must never upscale")
        if (orig.width > 100 || orig.height > 80) {
          val origRatio = orig.width.toDouble / orig.height
          val newRatio = m.width.toDouble / m.height
          assert(math.abs(origRatio - newRatio) / origRatio < 0.1,
            s"aspect drifted: $origRatio -> $newRatio")
          assert(m.bytes.length <= orig.bytes.length)
        } else assert(same(m, orig), "within bounds: untouched")
      }
    }
  }

  test("resamplePcmStub: downsample-only, duration kept, payload scaled") {
    val media = Multimodal.synthesize(Tables.load(spark, sf, "documents"))
      .as[Multimodal.MediaRecord]
    val in = media.collect().map(m => m.media_id -> m).toMap
    // synthesize() rates span 32..671, so toHz=16 forces every audio row
    // through the downsample branch (a larger target would be all no-ops)
    val out = Multimodal.resamplePcmStub(media, 16).collect()
    var downsampled = 0
    out.foreach { m =>
      val orig = in(m.media_id)
      if (orig.kind != "audio" || orig.width <= 16) {
        assert(m.width == orig.width && m.bytes.length == orig.bytes.length)
      } else {
        downsampled += 1
        assert(m.width == 16, "rate metadata must update")
        assert(m.duration_ms == orig.duration_ms, "duration is wall-clock, not samples")
        assert(m.bytes.length <= orig.bytes.length, "downsample never grows")
        val expect = math.min(orig.bytes.length,
          math.max(1, (orig.bytes.length * 16.0 / orig.width).toInt))
        assert(m.bytes.length == expect)
      }
    }
    assert(downsampled > 0, "the downsample branch must actually run")
    // a higher target rate is a no-op for every row
    val up = Multimodal.resamplePcmStub(media, 1000000).collect()
    up.foreach(m => assert(m.bytes.length == in(m.media_id).bytes.length))
  }

  test("sampleFrames: one row per 500ms step") {
    val media = Multimodal.synthesize(Tables.load(spark, sf, "documents"))
    val s = Multimodal.sampleFrames(media, 500L)
      .groupBy($"media_id").agg(count(lit(1)).as("n"))
      .join(media.select($"media_id", $"duration_ms"), "media_id")
      .withColumn("expect", floor(($"duration_ms" - 1) / 500) + 1)
    assert(s.filter($"n" =!= $"expect").count() == 0)
  }
}

class Round4OpsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{Dedup, Similarity, TextOps}

  test("repetitionSignals: hand-computed on a degenerate doc") {
    val df = Seq((1L, "a a a b"), (2L, "x y z w")).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(df, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // doc 1: 4 words, mean len 1, top word 3/4, bigrams (a a, a a, a b) -> 1/3 dupes
    assert(got(0) == ((1L, 4L, 1.0, 0.75, 0.3333)))
    // doc 2: no repetition at all
    assert(got(1) == ((2L, 4L, 1.0, 0.25, 0.0)))
  }

  test("repetitionSignals: fused expression matches the column composition") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    // the pre-fusion derivation, verbatim (tokenize → explode → two
    // grouped counts → join back) — kept here as the differential oracle
    // for the single-pass RepetitionStats expression
    def composed(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val arr = docs.select(col("doc_id"),
        split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " ").as("w"))
      val toks = arr.select(col("doc_id"), explode(col("w")).as("term"))
        .filter(col("term") =!= "")
      val termCounts = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val words = termCounts.groupBy("doc_id").agg(
        sum(col("c")).as("n_words"),
        round(sum(col("c") * length(col("term"))).cast(DoubleType) / sum(col("c")), 4)
          .as("mean_word_len"),
        round(max(col("c")).cast(DoubleType) / sum(col("c")), 4).as("top_word_frac"))
      val bigrams = arr.select(col("doc_id"),
        explode(transform(slice(col("w"), lit(1), size(col("w")) - 1),
          (x, i) => concat_ws(" ", x, element_at(col("w"), i + lit(2))))).as("bg"))
      val dupBg = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          round((sum(col("c")) - count(lit(1))).cast(DoubleType) / sum(col("c")), 4)
            .as("dup_bigram_frac"))
      words.join(dupBg, Seq("doc_id"), "left")
        .withColumn("dup_bigram_frac", coalesce(col("dup_bigram_frac"), lit(0.0)))
    }
    // adversarial rows: mixed case + punctuation, digits-only (dropped),
    // empty (dropped), null (dropped), single token (no bigrams → 0.0),
    // degenerate repetition, non-ASCII uppercase (lowercasing must match
    // Spark's lower()), hyphenated tokens, alternating bigrams, ragged
    // whitespace
    val edge = Seq(
      (1L, "Hello, WORLD! hello world hello"),
      (2L, "123 456 --- !!!"), (3L, ""), (5L, "single"),
      (6L, "a a a a a"), (7L, "ΣΙΣΥΦΟΣ Straße İstanbul"),
      (8L, "ab-cd ab cd ab-cd"), (9L, "x y x y x y"),
      (10L, "  leading   trailing  ")).toDF("doc_id", "text")
      .union(Seq((4L, Option.empty[String])).toDF("doc_id", "text"))
    val corpus = Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    for (docs <- Seq(edge, corpus)) {
      val got = TextOps.repetitionSignals(docs, "doc_id", "text")
        .as[(Long, Long, Double, Double, Double)].collect().toSet
      val want = composed(docs)
        .as[(Long, Long, Double, Double, Double)].collect().toSet
      assert(got == want && got.nonEmpty)
    }
  }

  test("termCounts: fused expression matches the explode-groupBy composition") {
    import org.apache.spark.sql.functions._
    // the pre-fusion tf derivation, verbatim — differential oracle for
    // the single-pass TermCounts expression (t05's tf frame and t08's
    // vocabulary input both reduce to it)
    def composed(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      docs.select(col("doc_id"),
          explode(split(trim(regexp_replace(lower(col("text")), "[^a-z]+", " ")), " "))
            .as("term"))
        .filter(col("term") =!= "")
        .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
    def fused(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      docs.select(col("doc_id"),
          explode(graft.functions.TermCounts.termCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.cnt").as("cnt"))
    val edge = Seq(
      (1L, "Hello, WORLD! hello world hello"),
      (2L, "123 456 --- !!!"), (3L, ""), (5L, "single"),
      (6L, "a a a a a"), (7L, "ΣΙΣΥΦΟΣ Straße İstanbul"),
      (8L, "ab-cd ab cd ab-cd"),
      (10L, "  leading   trailing  ")).toDF("doc_id", "text")
      .union(Seq((4L, Option.empty[String])).toDF("doc_id", "text"))
    val corpus = Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    for (docs <- Seq(edge, corpus)) {
      val got = fused(docs).as[(Long, String, Long)].collect().toSet
      val want = composed(docs).as[(Long, String, Long)].collect().toSet
      assert(got == want && got.nonEmpty)
    }
  }

  test("fused text counters match their regex twins") {
    import org.apache.spark.sql.functions._
    // adversarial rows: prefix words (a/and, the/theory), words at string
    // edges, underscores (word chars to \b), CJK profile words adjacent
    // and non-adjacent to ASCII word chars, non-ASCII whitespace (U+00A0
    // is NOT \s to Java regex), an astral emoji (one code point, one
    // match), digit runs (one match PER digit), empty and null text
    val edge = Seq(
      (1L, "a and land the theory of_the a"),
      (2L, "of the"), (3L, "the"), (5L, "x y"),
      (6L, "hi 😀! ok"), (7L, "abc123 45.6!!"),
      (8L, "a的b 我的书 的"),
      (9L, "The Quick (brown) fox-es _and_ and"),
      (10L, "  \t\n  "),
      // U+1D41A (astral LETTER): word char to \b, so "the𝐚"
      // has no trailing boundary and must NOT count
      (11L, "the𝐚 the 𝐚的")).toDF("doc_id", "text")
      .union(Seq((4L, Option.empty[String])).toDF("doc_id", "text"))
    val corpus = Tables.load(spark, sf, "documents").select($"doc_id", $"text")
    val zh = TextOps.LangProfiles.find(_._1 == "zh").get._2
    for (docs <- Seq(edge, corpus)) {
      val rows = docs.select($"doc_id",
          TextOps.bpeishTokenCount($"text").as("bf"),
          TextOps.bpeishTokenCountComposed($"text").as("bc"),
          TextOps.punctRatio($"text").as("pf"),
          TextOps.punctRatioComposed($"text").as("pc"),
          TextOps.stopwordRatioFor($"text", TextOps.Stopwords).as("sf_"),
          TextOps.stopwordRatioForComposed($"text", TextOps.Stopwords).as("sc"),
          TextOps.stopwordRatioFor($"text", zh).as("zf"),
          TextOps.stopwordRatioForComposed($"text", zh).as("zc"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.get(1) == r.get(2), s"bpeish mismatch on doc ${r.get(0)}: $r")
        assert(r.get(3) == r.get(4), s"punct mismatch on doc ${r.get(0)}: $r")
        assert(r.get(5) == r.get(6), s"stopword mismatch on doc ${r.get(0)}: $r")
        assert(r.get(7) == r.get(8), s"zh stopword mismatch on doc ${r.get(0)}: $r")
      }
    }
  }

  test("contamination: only docs sharing a full 5-gram with bench flag") {
    val train = Seq(
      (1L, "one two three four five six"),   // shares 5-grams with bench
      (2L, "one two three nine ten eleven"), // shares words but no 5-gram
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val bench = Seq((99L, "zero one two three four five")).toDF("doc_id", "text")
    val got = Dedup.contamination(train, bench, "doc_id", "text", k = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1's grams: {one..five, two..six}; bench has {zero..four, one..five}
    assert(got == Map(1L -> 1L))
  }

  test("ngramJaccardIncremental equals the full pair set restricted to batch-touching pairs") {
    val docs = Tables.load(spark, sf, "documents")
    val cut = 30L
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.1)
      .filter($"id2" >= cut)   // ids are monotone: id1 < id2, so "touches batch" = id2 >= cut
      .as[(Long, Long, Double)].collect().toSet
    val inc = Dedup.ngramJaccardIncremental(
        docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut),
        "doc_id", "text", k = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full && inc.nonEmpty)
  }

  test("ngramJaccardIncremental (capped, non-monotone split) equals the capped full pair set") {
    // Two independent hardenings of the monotone-split test above:
    // (1) finite maxDocFreq routes the capped branch (persisted capped
    //     index shared by both legs) — its df counts must equal the
    //     from-scratch operator's, i.e. be computed over corpus∪batch,
    //     not per side;
    // (2) a modulo split breaks the id1<id2 ≡ "id2 is new" shortcut, so
    //     pair orientation and the carried sizes must follow least/
    //     greatest, not probe/full roles.
    // deterministic 120-doc subset: a filter, NOT limit() — an unordered
    // GlobalLimit can pick a different row set in each of the several
    // independent evaluations of this frame (corpus leg, batch leg,
    // from-scratch runs), which would make the equivalence flaky
    val docs = Tables.load(spark, sf, "documents").filter($"doc_id" < 120)
    val isBatch = $"doc_id" % 3 === 0
    // batch membership is the split predicate itself — no collect job
    def inBatch(id: Long) = id % 3 == 0
    def full(cap: Int) = Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", k = 3, threshold = 0.1, maxDocFreq = cap)
      .as[(Long, Long, Double)].collect().toSet
    try {
      val fullCapped = full(2).filter(p => inBatch(p._1) || inBatch(p._2))
      val inc = Dedup.ngramJaccardIncremental(
          docs.filter(!isBatch), docs.filter(isBatch),
          "doc_id", "text", k = 3, threshold = 0.1, maxDocFreq = 2)
        .as[(Long, Long, Double)].collect().toSet
      assert(inc == fullCapped && inc.nonEmpty)
      // the cap must actually bind at these sizes, or the capped branch
      // wasn't meaningfully exercised
      val fullUncapped = full(Dedup.NoCap).filter(p => inBatch(p._1) || inBatch(p._2))
      assert(fullCapped != fullUncapped,
        "maxDocFreq=2 dropped nothing — raise the corpus size or lower the cap")
    } finally graft.operators.OperatorCaches.release()
  }

  test("ngramJaccardIncremental: a re-delivered id does not double-count") {
    val corpus = Seq((1L, "aa bb cc dd"), (2L, "zz yy xx ww")).toDF("doc_id", "text")
    // doc 1 re-delivered in the batch (at-least-once ingest)
    val batch = Seq((1L, "aa bb cc dd"), (3L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardIncremental(corpus, batch, "doc_id", "text",
        k = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect().toSet
    // 1: {aa bb cc, bb cc dd}; 3: + {cc dd ee}  ->  2/3; no inflated or
    // duplicated pairs from the doubled id
    assert(got == Set((1L, 3L, 0.6667)))
  }

  test("qualityScoreByLang scores against the document's own profile") {
    val de = "der hund und die katze das ist ein gutes tier und das haus"
    val docs = Seq((1L, "de", de), (2L, "en", de)).toDF("id", "lang", "text")
    val got = docs.select($"id",
        TextOps.qualityScoreByLang($"text", $"lang").as("q"),
        TextOps.qualityScore($"text").as("q_en"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // German text under the German profile beats the English-list score…
    assert(got(1L)._1 > got(1L)._2)
    // …and under lang='en' the by-lang score IS the English-profile score
    // (profiles differ from the default Stopwords list only slightly)
    assert(got(2L)._1 <= got(1L)._1)
    // unknown lang falls back to the default list = plain qualityScore
    val fb = Seq((3L, "xx", de)).toDF("id", "lang", "text")
      .select(TextOps.qualityScoreByLang($"text", $"lang").as("q"),
        TextOps.qualityScore($"text").as("qe"))
      .head()
    assert(fb.getDouble(0) == fb.getDouble(1))
  }

  test("tokenCount fused ≡ composed regex split on adversarial + fuzz strings") {
    // the fused byte-walk must reproduce size(split(trim(s), "\\s+"))
    // exactly — incl. the phantom leading empty field when the
    // space-trimmed string starts with other whitespace, space-only
    // trimming, and dropped trailing separators
    val edge = Seq(
      "", " ", "   ", "a", " a ", "a b", "  a  b  ", "a\tb", "\ta",
      "\na b", " \na b", "a b\n", "a b\n ", "\t", "\n", " \t ", "\r\na",
      "ab", "a\f b", "héllo 世界", "\n\n\nx", "x  \t\n  y")
    val rnd = new scala.util.Random(77)
    val chars = " \t\n\r\fab爱"
    val fuzz = Seq.fill(500)(
      Seq.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString)
    val df = (edge ++ fuzz).toDF("s").select($"s",
      TextOps.tokenCount($"s").as("fused"),
      TextOps.tokenCountComposed($"s").as("composed"))
    val diff = df.filter(!($"fused" <=> $"composed")).collect()
    assert(diff.isEmpty, s"divergence on: ${diff.take(5).mkString(", ")}")
  }

  test("fused text counters ≡ regex twins on fuzz strings") {
    import org.apache.spark.sql.functions._
    // random strings over a charset chosen to exercise every boundary
    // class the counters care about: ASCII letters/digits/punct, ASCII
    // whitespace, underscore (word char to \b), non-ASCII whitespace
    // (U+00A0: NOT \s), a CJK letter (word char to \b, punct to the
    // char classes), an astral letter (surrogate pair), and stopword
    // fragments so \b(the|a|of)\b hits prefix/edge cases
    val rnd = new scala.util.Random(42)
    val atoms = Seq("the", "a", "of", "and", " ", "\t", "\n", " ",
      "_", ".", "!", "7", "x", "的", "𝐚", "ab", "-")
    val fuzz = Seq.fill(600)(
      Seq.fill(rnd.nextInt(10))(atoms(rnd.nextInt(atoms.length))).mkString)
    val words = Seq("the", "a", "of", "的")
    val df = fuzz.toDF("s").select(
      TextOps.bpeishTokenCount($"s").as("bf"),
      TextOps.bpeishTokenCountComposed($"s").as("bc"),
      TextOps.punctRatio($"s").as("pf"),
      TextOps.punctRatioComposed($"s").as("pc"),
      TextOps.stopwordRatioFor($"s", words).as("sf_"),
      TextOps.stopwordRatioForComposed($"s", words).as("sc"),
      $"s")
    val diff = df.filter(!($"bf" <=> $"bc") || !($"pf" <=> $"pc") ||
      !($"sf_" <=> $"sc")).collect()
    assert(diff.isEmpty, s"divergence on: ${diff.take(5).mkString(", ")}")
  }

  test("fused tokenizing expressions ≡ compositions on fuzz strings") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    // same generator idea for the [a-z]-run tokenizer family: uppercase
    // (lowering must match Spark's lower), separators, runs, repeats —
    // repetition/term-count compositions recomputed per row
    val rnd = new scala.util.Random(7)
    val atoms = Seq("a", "b", "ab", "Ab", "THE", " ", ".", "1", "的", "-", "aa")
    val fuzz = Seq.tabulate(400)(i =>
      (i.toLong, Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.length))).mkString))
    val docs = fuzz.toDF("doc_id", "text")
    // TermCounts vs explode-groupBy
    val tcF = docs.select($"doc_id",
        explode(graft.functions.TermCounts.termCounts($"text")).as("tc"))
      .select($"doc_id", $"tc.term", $"tc.cnt")
      .as[(Long, String, Long)].collect().toSet
    val tcC = docs.select($"doc_id",
        explode(split(trim(regexp_replace(lower($"text"), "[^a-z]+", " ")), " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(tcF == tcC)
    // RepetitionStats raw counters vs independent per-string recompute
    val rs = docs.select($"doc_id",
        explode(graft.functions.RepetitionStats.repetitionStats($"text")).as("r"))
      .select($"doc_id", $"r.n_words", $"r.sum_len", $"r.top_cnt",
        $"r.n_bigrams", $"r.dup_bigrams")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    fuzz.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) assert(!rs.contains(id), s"doc $id should be dropped")
      else {
        val grouped = toks.groupBy(identity).view.mapValues(_.size.toLong)
        val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val want = (toks.size.toLong, toks.map(_.length.toLong).sum,
          grouped.values.max, bgs.size.toLong, (bgs.size - bgs.distinct.size).toLong)
        assert(rs(id) == want, s"doc $id '$text': ${rs(id)} != $want")
      }
    }
  }

  test("packByBudget: concat-and-chunk offsets, boundary straddle, empty doc") {
    // one stream (ids all ≡ 0 mod 1), capacity 10: docs of 4/8/0/5 tokens
    // lay out at offsets 0/4/12/12 — the 8-token doc straddles chunks 0→1,
    // the empty doc occupies no tokens and attaches to chunk 1
    val docs = Seq(
      (0L, "a b c d"),                    // 4 tokens  → [0,4)   chunk 0
      (1L, "a b c d e f g h"),            // 8 tokens  → [4,12)  chunks 0-1
      (2L, ""),                           // 0 tokens  → at 12   chunk 1
      (3L, "a b c d e")                   // 5 tokens  → [12,17) chunk 1
    ).toDF("doc_id", "text")
    val got = TextOps.packByBudget(docs, "doc_id", "text",
        capacity = 10L, streams = 1)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tok", $"tok_start", $"chunk_first", $"chunk_last")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 4L, 0L, 0L, 0L),
      (1L, 8L, 4L, 0L, 1L),
      (2L, 0L, 12L, 1L, 1L),
      (3L, 5L, 12L, 1L, 1L)))
    // streams partition the id space; total tokens are preserved per stream
    val two = TextOps.packByBudget(docs, "doc_id", "text", 10L, streams = 2)
    assert(two.select(countDistinct($"stream")).head().getLong(0) == 2)
    assert(two.agg(sum($"n_tok")).head().getLong(0) == 17L)
  }

  test("vocabulary: Zipf table with rank and cumulative coverage") {
    val docs = Seq(
      (1L, "the cat and the dog"),
      (2L, "the dog")).toDF("doc_id", "text")
    val got = TextOps.vocabulary(docs, "text", topK = 10)
      .select($"rnk", $"term", $"cnt", $"cum_frac")
      .as[(Int, String, Long, Double)].collect().toSeq.sortBy(_._1)
    // counts: the=3, dog=2, and=1, cat=1 (total 7); ties rank by term
    assert(got == Seq(
      (1, "the", 3L, 0.4286),
      (2, "dog", 2L, 0.7143),
      (3, "and", 1L, 0.8571),
      (4, "cat", 1L, 1.0)))
  }

  test("vocabulary: topK bounds output, cum_frac still against full total") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val got = TextOps.vocabulary(docs, "text", topK = 2)
      .select($"rnk", $"term", $"cum_frac")
      .as[(Int, String, Double)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "a", 0.5), (2, "b", 0.8333)))
  }

  test("clusterMedoids: picks the member nearest the label mean") {
    val df = Seq(
      (1L, 0, Array(0f, 0f)), (2L, 0, Array(2f, 0f)), (3L, 0, Array(1.1f, 0f)),
      (4L, 1, Array(5f, 5f)), (5L, 1, Array(7f, 5f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.clusterMedoids(df, "label")
      .select($"label", $"vec_id").as[(Int, Long)].collect().toMap
    // label 0 mean = (1.033, 0): vec 3 at 1.1 is closest
    // label 1 mean = (6, 5): tie between 4 and 5 (d2 = 1) -> lowest id
    assert(got == Map(0 -> 3L, 1 -> 4L))
  }

  test("hyperplaneLshParamsFor: recall floor holds across n=10^3..10^9 or is flagged") {
    // the r13 `weak` closed: the joint sizer's predicted recall at the
    // threshold boundary never silently drops below the floor — either
    // it holds (bands grew with n) or `clamped` says the floor didn't
    // fit maxBands. Sweep six decades × thresholds × floors.
    for (exp <- 3 to 9; theta <- Seq(0.4, 0.6, 0.8, 0.9);
         floor <- Seq(0.9, 0.95)) {
      val n = math.pow(10, exp).toLong
      val p = Dedup.hyperplaneLshParamsFor(n, theta, recallFloor = floor)
      if (!p.clamped)
        assert(p.predictedRecall >= floor, s"n=$n theta=$theta floor=$floor: $p")
      // the r13 occupancy rule stays intact: buckets/band track n/32
      val occ = n.toDouble / (1L << p.rowsPerBand)
      assert(occ <= 32.0, s"n=$n theta=$theta: occupancy $occ")
      assert(p.rowsPerBand >= 4 && p.rowsPerBand <= 62)
      assert(p.planes == p.bands * p.rowsPerBand)
    }
    // true near-dup regime (θ ≥ 0.8, ρ ≤ 0.33): floor reachable at ANY
    // scale within the default band budget — the 100 TB configuration
    for (exp <- 3 to 9; theta <- Seq(0.8, 0.9)) {
      val p = Dedup.hyperplaneLshParamsFor(math.pow(10, exp).toLong, theta)
      assert(!p.clamped && p.predictedRecall >= 0.95,
        s"theta=$theta n=10^$exp: $p")
    }
    // clamp honesty: an unreachable floor is flagged, never silent
    val c = Dedup.hyperplaneLshParamsFor(1000000000L, 0.4,
      recallFloor = 0.95, maxBands = 64)
    assert(c.clamped && c.predictedRecall < 0.95 && c.bands == 64)
    // bands grow with n at a fixed threshold (the n^ρ cost lever)
    assert(Dedup.hyperplaneLshParamsFor(60000L, 0.4).bands >
           Dedup.hyperplaneLshParamsFor(20000L, 0.4).bands)
  }

  test("cosineNearDupLSHBanded: auto-sized measured recall >= 0.9 at the 0.4 boundary") {
    // the d06_recall_gate assertion, runnable in-suite: the PRODUCTION
    // sizing (threshold 0.4, design floor 0.95) against the exact pair
    // list. Planes are seed-fixed, so the measured value is
    // deterministic for this corpus.
    val emb = Tables.load(spark, sf, "embeddings")
    val params = Dedup.hyperplaneLshParamsFor(emb.count(), 0.4,
      recallFloor = 0.95)
    assert(!params.clamped && params.predictedRecall >= 0.95)
    val found = Dedup.cosineNearDupLSHBanded(emb, "vec_id", "embedding",
        threshold = 0.4, dim = 64, params = params)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val exact = Dedup.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(found.subsetOf(exact), "exact-verified output can't exceed exact")
    val recall = (found & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"measured recall $recall over ${exact.size} pairs")
  }

  test("cosineNearDupLSHBanded: 0.9-floor sizing measured recall in its guarantee region") {
    // the d06b_recall_gate assertion, runnable in-suite: the 100 TB
    // tier sizes to a 0.95 floor AT cos >= 0.9 and emits >= 0.4
    // best-effort; of the exact pairs >= 0.9 the auto-sized banding
    // must find >= 90%. The corpus has no >= 0.9 pairs of its own
    // (they top out ~0.55), so it is augmented with sign-flip copies
    // (coordinate 0 negated -> cos ~ 1 - 2*v0^2/|v|^2 ~ 0.97, inside
    // the guarantee region but NOT sharing all bands - band recall
    // stays probabilistic, which is the property under test)
    val emb = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val aug = emb.unionByName(emb.filter($"vec_id" < 100)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding",
          (x, i) => when(i === 0, -x).otherwise(x)).as("embedding")))
    val params = Dedup.hyperplaneLshParamsFor(emb.count(), 0.9,
      recallFloor = 0.95)
    assert(!params.clamped && params.predictedRecall >= 0.95)
    val found = Dedup.cosineNearDupLSHBanded(aug, "vec_id", "embedding",
        threshold = 0.4, dim = 64, params = params)
      .filter($"cosine" >= 0.9)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    val exact = Dedup.cosineNearDupPairs(aug, "vec_id", "embedding", 0.9)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "augmentation must create guarantee-region pairs")
    assert(found.subsetOf(exact), "exact-verified output can't exceed exact")
    val recall = (found & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"measured recall $recall over ${exact.size} pairs")
  }

  test("hyperplanePlanesFor holds bucket occupancy, clamps to one long") {
    // occupancy target 32: buckets/band = 2^rowsPerBand must track
    // n/32 within one doubling (the constant-occupancy rule that keeps
    // candidate volume linear in n — r13 sf3 finding)
    for (n <- Seq(2000L, 20000L, 60000L, 1000000L)) {
      val planes = Dedup.hyperplanePlanesFor(n, bands = 4)
      assert(planes % 4 == 0)
      val buckets = 1L << (planes / 4)
      val occupancy = n.toDouble / buckets
      assert(occupancy <= 32.0 && occupancy > 8.0,
        s"n=$n planes=$planes occupancy=$occupancy")
    }
    // floor: tiny corpora keep a usable minimum band width
    assert(Dedup.hyperplanePlanesFor(10L, bands = 4) == 16)
    // ceiling: bands x rowsPerBand never exceeds the 64-bit signature
    val big = Dedup.hyperplanePlanesFor(Long.MaxValue, bands = 4)
    assert(big / 4 * 4 == big && big <= 63)
    // divisibility for non-power bands
    assert(Dedup.hyperplanePlanesFor(60000L, bands = 3) % 3 == 0)
  }
}
