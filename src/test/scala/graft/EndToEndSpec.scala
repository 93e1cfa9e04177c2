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
}
