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
    def asSingleFile(df: DataFrame): String = {
      val dir = Files.createTempDirectory("graft-poison").toString
      val staging = dir + "/_staging"
      df.coalesce(1).write.parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Path.of(dir, "events.parquet"))
      dir
    }

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
}
