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

    def timedReps(body: => Long): (Seq[Double], Long) = {
      var rows = 0L
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val (r, caches) = OperatorCaches.scoped { body }
        val secs = (System.nanoTime() - t0) / 1e9
        caches.release()
        rows = r
        secs
      }
      (times, rows)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val out = scala.collection.mutable.ArrayBuffer[String]()
    def record(member: String, form: String, pct: Int, batchRows: Long,
        corpusRows: Long, times: Seq[Double], pairs: Long): Unit = {
      val line = f"""{"member":"$member","form":"$form","batch_pct":$pct,""" +
        f""""batch_rows":$batchRows,"corpus_rows":$corpusRows,""" +
        f""""secs":${median(times)}%.3f,""" +
        s""""reps":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""pairs":$pairs}"""
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
    val pcts = Seq(1, 3, 10)
    def batchOf(base: DataFrame, idCol: String, lo: Long, pct: Int): DataFrame =
      base.filter(col(idCol) >= lo &&
        col(idCol) < lo + math.max(1L, corpusRows * pct / 100))

    // MinHash: build once (untimed), ingest per batch size
    val (mhIdx, mhScope) = OperatorCaches.scoped {
      val i = IngestIndex.buildMinHash(corpus, "doc_id", "text")
      i.buckets.count(); i.docs.count()
      i
    }
    for (pct <- pcts) {
      val batch = batchOf(docs, "doc_id", cut, pct)
      val bRows = batch.count()
      val (tc, pc) = timedReps {
        val (p, _) = IngestIndex.ingestMinHash(mhIdx, batch, "text", 0.8)
        p.count()
      }
      record("minhash", "carried", pct, bRows, corpusRows, tc, pc)
      val (tr, pr) = timedReps {
        Dedup.minHashIncremental(corpus, batch, "doc_id", "text",
          threshold = 0.8).count()
      }
      record("minhash", "recompute", pct, bRows, corpusRows, tr, pr)
    }
    mhScope.release()

    // SimHash
    val (shIdx, shScope) = OperatorCaches.scoped {
      val i = IngestIndex.buildSimHash(corpus, "doc_id", "text")
      i.buckets.count()
      i
    }
    for (pct <- pcts) {
      val batch = batchOf(docs, "doc_id", cut, pct)
      val bRows = batch.count()
      val (tc, pc) = timedReps {
        val (p, _) = IngestIndex.ingestSimHash(shIdx, batch, "text",
          maxHamming = 3)
        p.count()
      }
      record("simhash", "carried", pct, bRows, corpusRows, tc, pc)
      val (tr, pr) = timedReps {
        Dedup.simHashIncremental(corpus, batch, "doc_id", "text",
          maxHamming = 3).count()
      }
      record("simhash", "recompute", pct, bRows, corpusRows, tr, pr)
    }
    shScope.release()

    // cosine (embeddings table, same 90/10 protocol, d06-style sizing)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nEmb = emb.count()
    val eCut = (nEmb * 0.9).toLong
    val eCorpus = emb.filter(col("vec_id") < eCut)
    val eCorpusRows = eCorpus.count()
    val params = Dedup.hyperplaneLshParamsFor(eCorpusRows, threshold = 0.4,
      recallFloor = 0.95, maxBands = 64)
    val (cIdx, cScope) = OperatorCaches.scoped {
      val i = IngestIndex.buildCosine(eCorpus, "vec_id", "embedding",
        dim = 64, params = params)
      i.buckets.count(); i.docs.count()
      i
    }
    for (pct <- pcts) {
      val batch = emb.filter(col("vec_id") >= eCut &&
        col("vec_id") < eCut + math.max(1L, eCorpusRows * pct / 100))
      val bRows = batch.count()
      val (tc, pc) = timedReps {
        val (p, _) = IngestIndex.ingestCosine(cIdx, batch, threshold = 0.4)
        p.count()
      }
      record("cosine", "carried", pct, bRows, eCorpusRows, tc, pc)
      val (tr, pr) = timedReps {
        Dedup.cosineLshIncremental(eCorpus, batch, "vec_id", "embedding",
          threshold = 0.4, dim = 64, params = params).count()
      }
      record("cosine", "recompute", pct, bRows, eCorpusRows, tr, pr)
    }
    cScope.release()

    try spark.stop() catch { case _: Throwable => () }
    println(s"""{"probe":"ingest_amortization","sf_dir":"$sfDir",""" +
      s""""reps":$reps,"cpus":"$cpus","n_docs":$nDocs,"n_emb":$nEmb,""" +
      s""""rows":${out.size}}""")
    System.out.flush()
  }
}
