package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Scale, Similarity, TextOps}
import graft.sources.{ParquetStore, SQLiteIO}

/** The composed user story: raw documents → quality filter → dedup →
  * tokenize/fingerprint → embedding join → curated store, every stage a
  * library operator. What a training-data pipeline actually runs, end to
  * end through the public API. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: filter → dedup → enrich → join → store → read back") {
    val docs = Tables.load(spark, sf, "documents")
    val emb = Tables.load(spark, sf, "embeddings")
    val nDocs = docs.count()

    // 1. quality + language gate (narrow maps)
    val scored = docs
      .withColumn("quality", TextOps.qualityScore($"text"))
      .withColumn("pred_lang", TextOps.langId($"text"))
      .filter($"quality" >= 0.3)

    // 2. near-dup removal: drop the higher id of every verified pair
    val dupIds = Dedup.dedupMinHashPairs(scored, "doc_id", "text", threshold = 0.5)
      .select($"id2".as("doc_id")).distinct()
    val deduped = scored.join(dupIds, Seq("doc_id"), "left_anti")

    // 3. enrich: tokens + fingerprint
    val enriched = deduped
      .withColumn("n_tokens", TextOps.tokenCount($"text"))
      .withColumn("fp", TextOps.fingerprint($"text"))

    // 4. attach embeddings (broadcastable dim at this scale)
    val curated = enriched.join(
      broadcast(emb.select($"vec_id".as("doc_id"), $"embedding")), Seq("doc_id"), "left")

    // 5. persist with policy, read back, sanity
    val store = new ParquetStore(
      java.nio.file.Files.createTempDirectory("graft-e2e").toString)
    store.write(curated, "curated", SQLiteIO.IfExists.Replace)
    val back = store.read(spark, "curated")

    val n = back.count()
    assert(n > 0 && n <= nDocs)
    assert(back.filter($"quality" < 0.3).count() == 0)
    // dedup really removed the planted near-dups
    val remainingPairs = Dedup.dedupMinHashPairs(
      back.select($"doc_id", $"text"), "doc_id", "text", threshold = 0.5).count()
    assert(remainingPairs == 0, s"$remainingPairs near-dup pairs survived")
    // fingerprints unique after exact+near dedup
    assert(back.select($"fp").distinct().count() == n)
    // embeddings attached for every doc that has one
    assert(back.filter($"embedding".isNotNull).count() > 0)
  }

  test("poison pill: ns-long / µs-NTZ / µs-UTC events encodings all read identically") {
    // The corpus has silently switched physical ts encodings before
    // (TIMESTAMP(NANOS) → MICROS/NTZ), which broke 8 queries at once.
    // Write the SAME rows under all three encodings a writer might
    // produce and assert batch (Tables.load) and streaming
    // (EventStreams.readEventStream) normalize them to identical results.
    import java.nio.file.{Files, Path}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType, LongType}
    import graft.streaming.EventStreams

    // deterministic subset (a bare limit() has no row-selection guarantee
    // on recomputation — the three writes below must see identical rows)
    val base = Tables.load(spark, sf, "events").filter($"event_id" <= 500)

    // materialize df as a single FILE named events.parquet under its own
    // dir (the driver's layout; the stream reader globs on the file name)
    def asSingleFile(df: DataFrame): String = writeAsTable(df, "events")

    // pin the UTC leg to annotated TIMESTAMP(MICROS, adjustedToUTC=true)
    // (the session default could be INT96, which tests a different branch)
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val dirUtc = try asSingleFile(base)
      finally prevOut match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    val dirNtz = asSingleFile(base.withColumn("ts", $"ts".cast(TimestampNTZType)))
    // the ns leg is raw INT64 nanos: Spark cannot WRITE the annotated
    // TIMESTAMP(NANOS) logical type, but under nanosAsLong=true an
    // annotated file arrives as exactly this LongType shape, so the
    // normalization branch under test is the same either way
    val dirNs = asSingleFile(base.withColumn("ts", expr("unix_micros(ts) * 1000")))

    val dirs = Seq("utc" -> dirUtc, "ntz" -> dirNtz, "ns" -> dirNs)
    // batch: every encoding must land on TimestampType with equal rows
    val batches = dirs.map { case (tag, d) =>
      val got = Tables.load(spark, d, "events")
      assert(got.schema("ts").dataType == TimestampType, s"$tag batch dtype")
      tag -> got.orderBy($"event_id").collect().toSeq
    }.toMap
    assert(batches("ntz") == batches("utc"), "NTZ batch read diverged")
    assert(batches("ns") == batches("utc"), "ns-long batch read diverged")

    // streaming: the windowed aggregate over each encoding is identical
    val streams = dirs.map { case (tag, d) =>
      val agg = EventStreams.windowedCounts(EventStreams.readEventStream(spark, d))
      tag -> EventStreams.runToMemory(spark, agg, s"poison_$tag")
        .orderBy($"hour_start", $"event_type").collect().toSeq
    }.toMap
    assert(streams("utc").nonEmpty)
    assert(streams("ntz") == streams("utc"), "NTZ stream read diverged")
    assert(streams("ns") == streams("utc"), "ns-long stream read diverged")
  }

  /** Materialize df as the driver's table layout: one FILE named
    * `<table>.parquet` under a fresh dir (what Tables.load and the stream
    * reader's pathGlobFilter expect). */
  private def writeAsTable(df: org.apache.spark.sql.DataFrame, table: String): String = {
    import java.nio.file.{Files, Path}
    val dir = Files.createTempDirectory("graft-poison").toString
    val staging = dir + "/_staging"
    df.coalesce(1).write.parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Path.of(dir, s"$table.parquet"))
    dir
  }

  test("poison pill: float[] / double[] embeddings encodings read identically") {
    // If the generator re-encodes embedding as list<double>, a blanket
    // float cast would LOSE the precision the DuckDB oracle computes
    // with; the vector expressions instead bind to the file's element
    // width. float→double casting a float corpus is an exact widening,
    // so the exact operators must agree bit-for-bit across encodings.
    val base = Tables.load(spark, sf, "embeddings").filter($"vec_id" < 300)
    val dirF = writeAsTable(base, "embeddings")
    val dirD = writeAsTable(
      base.withColumn("embedding", $"embedding".cast("array<double>")), "embeddings")

    def run(dir: String) = {
      val emb = Tables.load(spark, dir, "embeddings")
      val q = emb.filter($"vec_id" < 4)
        .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
      val topk = Similarity.bruteForceTopK(emb, q, 5)
        .orderBy($"query_id", $"rank").collect().toSeq
      val exact = Dedup.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.3).orderBy($"id1", $"id2").collect().toSeq
      val lsh = Dedup.cosineNearDupLSH(emb, "vec_id", "embedding",
        threshold = 0.3, dim = 64, planes = 32, bands = 4)
        .orderBy($"id1", $"id2").collect().toSeq
      (topk, exact, lsh)
    }
    val (tF, eF, lF) = run(dirF)
    val (tD, eD, lD) = run(dirD)
    assert(tF.nonEmpty && eF.nonEmpty)
    assert(tD == tF, "brute-force top-k diverged between float[] and double[]")
    assert(eD == eF, "exact cosine pairs diverged between float[] and double[]")
    assert(lD == lF, "LSH cosine pairs diverged between float[] and double[]")
    // the Lloyd fit is legitimately NOT bit-identical across widths (float
    // corpora quantize means, double keep full precision) — assert the
    // double path runs end-to-end and assigns every vector instead
    val embD = Tables.load(spark, dirD, "embeddings")
    val (cents, assigned) = Similarity.kmeansFit(embD, k = 4, iters = 2)
    assert(cents.size == 4 && assigned.count() == embD.count())
    graft.operators.OperatorCaches.release()
  }

  test("poison pill: double / decimal events value encodings aggregate identically") {
    import org.apache.spark.sql.types.DoubleType
    import graft.streaming.EventStreams
    // 2-decimal base values: decimal(12,2) holds them exactly, and the
    // decimal→double normalization lands on the same nearest-double
    val base = Tables.load(spark, sf, "events").filter($"event_id" <= 2000)
      .withColumn("value", round($"value", 2))
    val dirDbl = writeAsTable(base, "events")
    val dirDec = writeAsTable(
      base.withColumn("value", $"value".cast("decimal(12,2)")), "events")

    def runBatch(dir: String) = {
      val ev = Tables.load(spark, dir, "events")
      assert(ev.schema("value").dataType == DoubleType, s"value not normalized in $dir")
      ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("tot"))
        .orderBy($"event_type").collect().toSeq
    }
    val bDbl = runBatch(dirDbl)
    assert(bDbl.nonEmpty)
    assert(runBatch(dirDec) == bDbl, "decimal batch read diverged")

    // streaming: the same normalization guards the stream-side schema bind
    def runStream(dir: String, tag: String) =
      EventStreams.runToMemory(spark,
        EventStreams.windowedCounts(EventStreams.readEventStream(spark, dir)),
        s"poison_val_$tag")
        .orderBy($"hour_start", $"event_type").collect().toSeq
    val sDbl = runStream(dirDbl, "dbl")
    assert(sDbl.nonEmpty)
    assert(runStream(dirDec, "dec") == sDbl, "decimal stream read diverged")
  }

  test("poison pill: decimal(12,2) lineitem/orders money columns aggregate identically") {
    import org.apache.spark.sql.types.DoubleType
    // The TPC-H spec (and DuckDB's tpch extension) type the money and
    // quantity columns DECIMAL — this corpus's double encoding is the
    // anomaly, so a generator flip to decimal(12,2) is the likeliest
    // remaining poison pill (r10 verdict #6). It would change the result
    // type of every sum(l_extendedprice * (1 - l_discount)) oracle at a
    // stroke; Tables.normalizeMoney maps both encodings to the identical
    // nearest-double (the source values carry exactly 2 decimals).
    val li = Tables.load(spark, sf, "lineitem").filter($"l_orderkey" <= 3000)
    val ord = Tables.load(spark, sf, "orders").filter($"o_orderkey" <= 3000)
    val dirDbl = writeAsTable(li, "lineitem")
    val dirDec = writeAsTable(
      li.withColumn("l_quantity", $"l_quantity".cast("decimal(12,2)"))
        .withColumn("l_extendedprice", $"l_extendedprice".cast("decimal(12,2)"))
        .withColumn("l_discount", $"l_discount".cast("decimal(12,2)"))
        .withColumn("l_tax", $"l_tax".cast("decimal(12,2)")), "lineitem")
    // orders rides along in each dir so a join query can run against both
    locally {
      import java.nio.file.{Files, Path}
      def addOrders(dir: String, o: org.apache.spark.sql.DataFrame): Unit = {
        val staging = dir + "/_ostaging"
        o.coalesce(1).write.parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, Path.of(dir, "orders.parquet"))
      }
      addOrders(dirDbl, ord)
      addOrders(dirDec, ord.withColumn("o_totalprice",
        $"o_totalprice".cast("decimal(12,2)")))
    }

    def run(dir: String) = {
      val l = Tables.load(spark, dir, "lineitem")
      val o = Tables.load(spark, dir, "orders")
      for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        assert(l.schema(c).dataType == DoubleType, s"$c not normalized in $dir")
      assert(o.schema("o_totalprice").dataType == DoubleType,
        s"o_totalprice not normalized in $dir")
      // the q01 shape — the exact aggregate family the 4 sf1 selfcheck
      // FAILs live in; double-vs-decimal inputs must agree bit-for-bit
      // after normalization because the summation order is the same plan
      val agg = l.groupBy($"l_returnflag", $"l_linestatus")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc"),
          round(avg($"l_discount"), 4).as("avg_disc"))
        .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
      val joined = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(round(sum($"l_extendedprice"), 2).as("rev"),
          round(max($"o_totalprice"), 2).as("maxtot"))
        .orderBy($"o_orderstatus").collect().toSeq
      (agg, joined)
    }
    val rDbl = run(dirDbl)
    assert(rDbl._1.nonEmpty && rDbl._2.nonEmpty)
    assert(run(dirDec) == rDbl, "decimal money encoding diverged from double")
  }

  test("poison pill: string / binary documents text encodings read identically") {
    import org.apache.spark.sql.types.StringType
    val base = Tables.load(spark, sf, "documents").filter($"doc_id" < 400)
    val dirS = writeAsTable(base, "documents")
    val dirB = writeAsTable(
      base.withColumn("text", $"text".cast("binary")), "documents")

    def run(dir: String) = {
      val docs = Tables.load(spark, dir, "documents")
      assert(docs.schema("text").dataType == StringType, s"text not normalized in $dir")
      val feats = docs.select($"doc_id",
          TextOps.tokenCount($"text").as("nt"),
          TextOps.fingerprint($"text").as("fp"),
          TextOps.qualityScore($"text").as("q"))
        .orderBy($"doc_id").collect().toSeq
      val dups = Dedup.dedupMinHashPairs(docs, "doc_id", "text", threshold = 0.5)
        .orderBy($"id1", $"id2").collect().toSeq
      graft.operators.OperatorCaches.release()
      (feats, dups)
    }
    val rS = run(dirS)
    assert(rS._1.nonEmpty)
    assert(run(dirB) == rS, "binary-text read diverged from string-text")
  }
}
