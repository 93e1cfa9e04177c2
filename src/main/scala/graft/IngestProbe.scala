package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-amortization probe (r16): measures the incremental dedup
  * family in the BATCH dimension at a fixed corpus — the axis the
  * decade table (which varies corpus size) cannot see. For each member
  * (MinHash / cosine-LSH / SimHash) and batch = 1% / 3% / 10% of the
  * corpus, it times the recompute incremental
  * ([[operators.Dedup.minHashIncremental]] etc. — re-shingles and
  * re-shuffles the corpus per call, so cost should be ≈flat in batch:
  * corpus-dominated) against the carried-index ingest
  * ([[operators.IngestIndex]] — the index is built ONCE, untimed, and
  * each ingest's exchanges are batch-proportional, so cost should track
  * batch). PERF.md records the two curves; the spread between them at
  * small batch is the amortization the carried form buys.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> SPARK_GRAFT_CPUS=32
  *   sbt "runMain graft.IngestProbe [reps]"
  * One JSON line per (member, form, batch) plus a trailing summary.
  *
  * SPARK_GRAFT_GATE_ROWS overrides the carried ingests' broadcast
  * gate: 0 forces every probe onto the co-partitioned shuffled-hash
  * route (the above-gate shape), so a run pair (default vs 0) measures
  * the crossover — same batches, same corpus, route as the only
  * variable.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt)
      .orElse(sys.env.get("SPARK_GRAFT_REPS").map(_.toInt)).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import operators.{Dedup, IngestIndex, OperatorCaches}

    // wall time AND shuffle records written per run: at small sf the
    // wall clock sits on Spark's per-job floor, so the records are the
    // scale-honest signal (they are what grows at 100 TB)
    val meter = new ShuffleMeter(spark.sparkContext)
    def quiesce(): Long = meter.quiesce()
    def timedReps(body: => Long): (Seq[Double], Long, Long) = {
      var rows = 0L
      var lastShuffle = 0L
      val times = (1 to reps).map { _ =>
        val before = quiesce()
        val t0 = System.nanoTime()
        val (r, caches) = OperatorCaches.scoped { body }
        val secs = (System.nanoTime() - t0) / 1e9
        caches.release()
        lastShuffle = quiesce() - before
        rows = r
        secs
      }
      (times, rows, lastShuffle)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val out = scala.collection.mutable.ArrayBuffer[String]()
    def record(member: String, form: String, pct: Double, batchRows: Long,
        corpusRows: Long, times: Seq[Double], pairs: Long,
        shuffled: Long): Unit = {
      val line = f"""{"member":"$member","form":"$form","batch_pct":$pct,""" +
        f""""batch_rows":$batchRows,"corpus_rows":$corpusRows,""" +
        f""""secs":${median(times)}%.3f,""" +
        s""""reps":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""shuffle_records":$shuffled,"pairs":$pairs}"""
      println(line)
      out += line
    }

    // documents members ------------------------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val cut = (nDocs * 0.9).toLong // ids are contiguous in generated corpora
    val corpus = docs.filter(col("doc_id") < cut)
    val corpusRows = corpus.count()
    // fractional pcts let a bigger corpus (data_sf10) run the SAME
    // absolute batch as sf1's 1% — the corpus-growth leg of the
    // amortization table (fixed batch, 10x corpus)
    val pcts = sys.env.getOrElse("SPARK_GRAFT_BATCH_PCTS", "1,3,10")
      .split(",").map(_.trim.toDouble).toSeq
    val members = sys.env.getOrElse("SPARK_GRAFT_MEMBERS",
      "minhash,simhash,cosine").split(",").map(_.trim).toSet
    // 0.4 = the d06 recall-priced sizing (candidate-volume-bound —
    // ingest cost is pair-dominated in BOTH forms); 0.9 = the d06b
    // ≈linear tier (few bands, corpus-term-dominated — where the
    // carried index's amortization is the whole cost)
    val cosineT = sys.env.getOrElse("SPARK_GRAFT_COSINE_T", "0.4").toDouble
    val gateRows = sys.env.get("SPARK_GRAFT_GATE_ROWS").map(_.toLong)
      .getOrElse(IngestIndex.defaultBroadcastGateRows)
    def rowsFor(pct: Double, base: Long): Long =
      math.max(1L, (base * pct / 100.0).toLong)
    def batchOf(base: DataFrame, idCol: String, lo: Long, pct: Double,
        corpusN: Long): DataFrame =
      base.filter(col(idCol) >= lo && col(idCol) < lo + rowsFor(pct, corpusN))

    // MinHash: build once (untimed), ingest per batch size
    if (members("minhash")) {
    val (mhIdx, mhScope) = OperatorCaches.scoped {
      val i = IngestIndex.buildMinHash(corpus, "doc_id", "text")
      i.buckets.count(); i.docs.count()
      i
    }
    for (pct <- pcts) {
      val batch = batchOf(docs, "doc_id", cut, pct, corpusRows)
      val bRows = batch.count()
      val (tc, pc, sc1) = timedReps {
        val (p, _) = IngestIndex.ingestMinHash(mhIdx, batch, "text", 0.8,
          broadcastGateRows = gateRows)
        p.count()
      }
      record("minhash", "carried", pct, bRows, corpusRows, tc, pc, sc1)
      val (tr, pr, sr1) = timedReps {
        Dedup.minHashIncremental(corpus, batch, "doc_id", "text",
          threshold = 0.8).count()
      }
      record("minhash", "recompute", pct, bRows, corpusRows, tr, pr, sr1)
    }
    mhScope.release()
    }

    // SimHash
    if (members("simhash")) {
    val (shIdx, shScope) = OperatorCaches.scoped {
      val i = IngestIndex.buildSimHash(corpus, "doc_id", "text")
      i.buckets.count()
      i
    }
    for (pct <- pcts) {
      val batch = batchOf(docs, "doc_id", cut, pct, corpusRows)
      val bRows = batch.count()
      val (tc, pc, sc1) = timedReps {
        val (p, _) = IngestIndex.ingestSimHash(shIdx, batch, "text",
          maxHamming = 3, broadcastGateRows = gateRows)
        p.count()
      }
      record("simhash", "carried", pct, bRows, corpusRows, tc, pc, sc1)
      val (tr, pr, sr1) = timedReps {
        Dedup.simHashIncremental(corpus, batch, "doc_id", "text",
          maxHamming = 3).count()
      }
      record("simhash", "recompute", pct, bRows, corpusRows, tr, pr, sr1)
    }
    shScope.release()
    }

    // carried IVF (embeddings table, same 90/10 protocol): centroids
    // trained once on the corpus (untimed — production trains on a
    // sample and freezes); "recompute" is the no-index pipeline shape,
    // re-assigning the whole union per arriving batch via
    // buildIvfIndex, vs the carried ivfIngest which assigns only the
    // batch. The per-batch segment materializes via assigned.count()
    // (the corpus side reads from cache, shuffle-free).
    if (members("ivf")) {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val nEmb = emb.count()
      val eCut = (nEmb * 0.9).toLong
      val eCorpus = emb.filter(col("vec_id") < eCut)
      val eCorpusRows = eCorpus.count()
      import operators.Similarity
      val nCells = math.max(2,
        math.ceil(math.sqrt(eCorpusRows.toDouble)).toInt)
      val (cents, _) = Similarity.kmeansFit(eCorpus, nCells, iters = 5)
      val session = spark
      import session.implicits._
      val centFrame = cents.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("cell_id", "cell_vec")
      val (iIdx, iScope) = OperatorCaches.scoped {
        val i = Similarity.buildIvfIndex(eCorpus, centFrame)
        i.assigned.count(); i.centroids.count()
        i
      }
      for (pct <- pcts) {
        val batch = emb.filter(col("vec_id") >= eCut &&
          col("vec_id") < eCut + rowsFor(pct, eCorpusRows))
        val bRows = batch.count()
        val (tc, pc, sc1) = timedReps {
          Similarity.ivfIngest(iIdx, batch).assigned.count()
        }
        record("ivf", "carried", pct, bRows, eCorpusRows, tc, pc, sc1)
        val (tr, pr, sr1) = timedReps {
          Similarity.buildIvfIndex(eCorpus.unionByName(batch), centFrame)
            .assigned.count()
        }
        record("ivf", "recompute", pct, bRows, eCorpusRows, tr, pr, sr1)
      }
      iScope.release()
      OperatorCaches.release() // kmeansFit's unscoped corpus persist
    }

    // cosine (embeddings table, same 90/10 protocol, d06-style sizing)
    if (members("cosine")) {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nEmb = emb.count()
    val eCut = (nEmb * 0.9).toLong
    val eCorpus = emb.filter(col("vec_id") < eCut)
    val eCorpusRows = eCorpus.count()
    val params = Dedup.hyperplaneLshParamsFor(eCorpusRows,
      threshold = cosineT, recallFloor = 0.95, maxBands = 64)
    val (cIdx, cScope) = OperatorCaches.scoped {
      val i = IngestIndex.buildCosine(eCorpus, "vec_id", "embedding",
        dim = 64, params = params)
      i.buckets.count(); i.docs.count()
      i
    }
    for (pct <- pcts) {
      val batch = emb.filter(col("vec_id") >= eCut &&
        col("vec_id") < eCut + rowsFor(pct, eCorpusRows))
      val bRows = batch.count()
      val (tc, pc, sc1) = timedReps {
        val (p, _) = IngestIndex.ingestCosine(cIdx, batch,
          threshold = cosineT, broadcastGateRows = gateRows)
        p.count()
      }
      record(s"cosine$cosineT", "carried", pct, bRows, eCorpusRows, tc, pc, sc1)
      val (tr, pr, sr1) = timedReps {
        Dedup.cosineLshIncremental(eCorpus, batch, "vec_id", "embedding",
          threshold = cosineT, dim = 64, params = params).count()
      }
      record(s"cosine$cosineT", "recompute", pct, bRows, eCorpusRows, tr, pr, sr1)
    }
    cScope.release()
    }

    try spark.stop() catch { case _: Throwable => () }
    println(s"""{"probe":"ingest_amortization","sf_dir":"$sfDir",""" +
      s""""reps":$reps,"cpus":"$cpus","n_docs":$nDocs,""" +
      s""""gate_rows":$gateRows,"rows":${out.size}}""")
    System.out.flush()
  }
}
