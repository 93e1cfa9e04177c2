package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: guard the properties PERF.md documents —
  * pruned scans, pushed filters, broadcast joins, TakeOrderedAndProject —
  * against regressions. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter pushed to scan + partial aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), "expected map-side partial aggregation")
    assert(p.contains("PushedFilters") || p.contains("l_shipdate"),
      "expected shipdate filter at the scan")
  }

  test("q01: scan prunes to referenced columns only") {
    val p = plan("q01_pricing_summary")
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("l_orderkey"), "unreferenced column not pruned")
  }

  test("q06: dimension joins are broadcast") {
    val p = plan("q06_join_3way")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
    assert(!p.contains("SortMergeJoin"), "no shuffle join expected at this scale")
  }

  test("q17: top-k lowers to TakeOrderedAndProject") {
    assert(plan("q17_topk").contains("TakeOrderedAndProject"))
  }

  test("q09: semi join stays LeftSemi with pushed quantity filter") {
    val p = plan("q09_join_semi")
    assert(p.contains("LeftSemi"))
    assert(p.contains("49"), "quantity predicate should reach the scan side")
  }

  test("registered SQL functions resolve and agree with Column API") {
    Graft.registerFunctions(spark)
    // deterministic subset — the view and the Column-API frame evaluate
    // independently; an unordered limit could pick different row sets
    Tables.load(spark, sf, "documents").filter($"doc_id" < 50)
      .createOrReplaceTempView("d50")
    val viaSql = spark.sql(
      "SELECT doc_id, lang_id(text) l, simhash64(tokenize_words(text)) s FROM d50")
      .orderBy($"doc_id").collect()
    val viaCol = Tables.load(spark, sf, "documents").filter($"doc_id" < 50)
      .select($"doc_id", graft.operators.TextOps.langId($"text").as("l"),
        graft.functions.SimHash64.simhash64(
          graft.functions.TokenizeWords.tokenizeWords($"text")).as("s"))
      .orderBy($"doc_id").collect()
    assert(viaSql.sameElements(viaCol))
    val dotv = spark.sql("SELECT vec_dot(array(1.0F,2.0F), array(2.0F,3.0F)) d")
      .as[Double].head()
    assert(dotv == 8.0)
  }

  test("q54: Q5-shape keeps dims broadcast and date filter at the orders scan") {
    val p = plan("q54_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast dim joins")
    assert(p.contains("partial_sum"), "expected map-side partial aggregation")
    val ordersScan = p.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("o_orderdate")).get
    assert(ordersScan.contains("PushedFilters: [") && ordersScan.contains("o_orderdate"),
      "orderdate range filter should push to the parquet scan")
  }

  test("q55: posexplode stays a narrow Generate (no shuffle before the sort)") {
    val p = plan("q55_posexplode_words")
    assert(p.contains("Generate posexplode"), "expected the built-in Generator")
    // EXACTLY one exchange: the final range-partitioned sort. The count
    // is over the initial physical plan (pre-AQE-replan), which is
    // deterministic — the old <=2 slack would have let a reintroduced
    // mid-plan shuffle pass unnoticed (r11 ADVICE).
    assert("Exchange".r.findAllIn(p).size == 1, s"expected exactly the sort exchange:\n$p")
  }

  test("t07: repetition signals run as one narrow pass — sort is the only exchange") {
    val p = plan("t07_repetition")
    assert(p.contains("repetition_stats"), "expected the fused RepetitionStats pass")
    // the fused expression must be evaluated inside a Generate (single
    // evaluation, tokenless docs dropped), never duplicated into a
    // pushed-down filter
    assert(p.contains("Generate explode"), s"expected explode of the stats array:\n$p")
    // EXACTLY one exchange: the query's final range-partitioned orderBy
    // (initial pre-AQE plan, deterministic — exact count per r11 ADVICE)
    assert("Exchange".r.findAllIn(p).size == 1, s"expected exactly the orderBy exchange:\n$p")
    assert(!p.contains("HashAggregate"), s"no aggregation should remain:\n$p")
  }

  test("q57: interval join plans as an equi-join, not BroadcastNestedLoopJoin") {
    val p = plan("q57_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"binned interval join must not fall back to BNLJ:\n$p")
    assert(p.contains("Join") || p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("prefix GLOB compiles to StartsWith and pushes to the parquet scan") {
    import graft.functions.SQLiteExprs
    val df = Tables.load(spark, sf, "part")
      .filter(SQLiteExprs.glob($"p_brand", "Brand#1*"))
      .select($"p_partkey")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("StartsWith(p_brand"), s"expected StartsWith predicate:\n$p")
    assert(p.contains("StringStartsWith(p_brand,Brand#1"),
      s"expected the prefix pushed to the scan:\n$p")
  }

  test("RegexPrefixPushdown rewrites anchored-literal rlike to a pushed StartsWith") {
    // raw user rlike, not via glob(): the optimizer rule must catch it
    val df = Tables.load(spark, sf, "part")
      .filter($"p_brand".rlike("^Brand#2.*"))
      .select($"p_partkey")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("RLike"), s"rlike should have been rewritten:\n$p")
    assert(p.contains("StringStartsWith(p_brand,Brand#2"),
      s"expected the prefix pushed to the scan:\n$p")
    // semantics preserved incl. the escaped-metachar path of the parser
    import graft.plans.RegexPrefixPushdown.literalPrefix
    assert(literalPrefix("^Brand\\#1.*") == None)     // '#' is not escapable in our set
    assert(literalPrefix("^a\\.b") == Some("a.b"))    // escaped '.' is literal
    assert(literalPrefix("^a.b") == None)             // live '.' — not a prefix
    assert(literalPrefix("^abc$") == None)            // $-anchored: left alone
    assert(literalPrefix("^a\\d.*") == None)          // regex class: left alone
  }

  test("q84/q85: sketches aggregate map-side; quantile rank-check broadcasts") {
    // HLL++ must ride the partial-aggregation path (register state
    // merged map-side before one shuffle), and the GK rank check must
    // broadcast the 3-row sketch output — the fact table never shuffles.
    val p84 = plan("q84_sketch_distinct")
    assert(p84.contains("partial_approx_count_distinct"),
      s"expected map-side HLL++ partial state:\n$p84")
    val p85 = plan("q85_sketch_quantiles")
    assert(p85.contains("BroadcastNestedLoopJoin"),
      s"expected the 3-row sketch side broadcast for the theta join:\n$p85")
    assert(!p85.contains("SortMergeJoin"),
      s"the fact table must not shuffle for the rank check:\n$p85")
  }

  test("q86: table profile is ONE scan + one 1-row merge, partials map-side") {
    // the profiler's contract: however many columns are profiled, the
    // data is read once and only the 1-row partial-agg state crosses an
    // Exchange (plus the 6-row melt's presentation sort)
    val p = plan("q86_table_profile")
    assert("FileScan".r.findAllIn(p).size == 1, s"expected exactly one scan:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"expected map-side profile partials:\n$p")
    // the sketch rides the gate form (exact companions excluded from
    // the benched row — same split as the d02/d06 gates)
    val pg = plan("q86_profile_gate")
    assert(pg.contains("partial_approx_count_distinct"),
      s"expected map-side sketch partials in the gate:\n$pg")
  }

  test("m05/m06/m07: multimodal decode pipelines stay narrow until the final sort") {
    // encode → transform → decode → project must be one shuffle-free
    // span per pipeline: the only Exchange allowed is the final
    // presentation ORDER BY (m05/m06) or the explode's output ordering
    // (m07). A second Exchange means a decode stage shuffled payloads.
    for (q <- Seq("m05_resize_real", "m06_resample_real", "m07_gif_frames")) {
      val p = plan(q)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 2, s"$q: decode path grew a shuffle:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"$q: no join belongs in a per-row codec pipeline:\n$p")
    }
  }

  test("d08: benchmark gram probe joins broadcast, never shuffles the corpus stream") {
    val p = plan("d08_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the benchmark gram set broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus gram stream must not sort-merge:\n$p")
  }

  test("s05: centroid re-join is broadcast; arg-min is an aggregate, not a window sort") {
    val p = plan("s05_cluster_medoid")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the (label, dim) centroid frame broadcast:\n$p")
    assert(p.contains("max_by") || p.contains("partial_max_by"),
      s"expected max_by partial aggregation for the arg-min:\n$p")
    assert(!p.contains("Window"), s"no window sort expected:\n$p")
  }

  test("s02 IVF: corpus cell-assignment is max_by partial agg — no window over the N×K frame") {
    // r14 verdict weak (perf half): the corpus-assignment stage used to
    // ship corpus×K rows — embedding vectors included — through a
    // Window.partitionBy(id) sort-exchange to pick the nearest cell.
    // The K scored copies of a row are born in ONE task, so a max_by
    // partial aggregation reduces them K→1 map-side (kmeansFit.assign's
    // shape). Pin: the assignment aggregates (max_by present), and the
    // only Window nodes left are query-sized — the nprobe ranking over
    // queries×K and the final top-k rank over results (2 windows, both
    // on query_id), never a third over the corpus×cells frame.
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cents = (0 until 4).map(i =>
      (i, Array.tabulate(64)(d => if (d % 4 == i) 1.0 else 0.0)))
      .toDF("cell_id", "cell_vec")
    val p = finalPlan(graft.operators.Similarity.ivfTopKWithCells(
      emb, q, cents, k = 5, nprobe = 2))
    assert(p.contains("max_by") || p.contains("partial_max_by"),
      s"expected max_by partial aggregation for the corpus assignment:\n$p")
    val windows = "Window ".r.findAllIn(p).size
    assert(windows <= 2,
      s"expected only the two query-sided windows (probe rank + final rank), got $windows:\n$p")
  }

  test("kmeansFit: narrow argmax assignment plans ZERO exchanges") {
    // r18 (r17 verdict #3): the Lloyd assignment step is one codegen'd
    // narrow map over a literal centroid matrix — the corpus is never
    // shuffled to pick its nearest centroid. The max_by shape this
    // replaced exchanged one pre-reduced row per corpus row per
    // iteration; its plan (narrowAssign = false) is asserted to still
    // carry that exchange so the A/B stays honest.
    val emb = Tables.load(spark, sf, "embeddings")
    val narrow = graft.operators.Similarity.kmeansFit(
      emb, k = 4, iters = 0, narrowAssign = true)._2
    val pN = narrow.queryExecution.executedPlan.toString
    assert(!pN.contains("Exchange"),
      s"narrow assignment must not shuffle the corpus:\n$pN")
    assert(pN.contains("cosine_argmax") || pN.contains("CosineArgmaxK"),
      s"expected the fused argmax expression:\n$pN")
    val maxby = graft.operators.Similarity.kmeansFit(
      emb, k = 4, iters = 0, narrowAssign = false)._2
    val pB = maxby.queryExecution.executedPlan.toString
    assert(pB.contains("Exchange"),
      s"max_by A/B variant should keep its per-corpus-row exchange:\n$pB")
  }

  test("ivfTopKWithCentroids: corpus cell-assignment is a narrow map, not an aggregation") {
    // r18: with driver-side centroids the corpus-side assignment is the
    // fused argmax (no max_by aggregation, no corpus groupBy exchange);
    // the frame route (carried indexes) keeps the max_by shape — the
    // test above pins that one.
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cents = (0 until 4).map(i =>
      Array.tabulate(64)(d => if (d % 4 == i) 1.0 else 0.0)).toSeq
    val p = finalPlan(graft.operators.Similarity.ivfTopKWithCentroids(
      emb, q, cents, k = 5, nprobe = 2))
    assert(p.contains("cosine_argmax"),
      s"expected the fused argmax expression for the corpus assignment:\n$p")
    assert(!p.contains("max_by") && !p.contains("partial_max_by"),
      s"corpus assignment must not aggregate:\n$p")
  }

  test("q63: grouping sets plans one Expand + partial aggregation") {
    val p = plan("q63_grouping_sets")
    assert(p.contains("Expand"), "grouping sets lower to Expand")
    assert(p.contains("partial_"), "expected map-side partial aggregation")
  }

  test("p01: pipeline keeps the contamination anti-join broadcast") {
    val p = plan("p01_prep_pipeline")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected a broadcast anti-join for decontamination:\n$p")
  }

  test("q70: null-safe equality (<=>)) is an equi-join key — hash join, never BNLJ") {
    val p = plan("q70_nullsafe_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"EqualNullSafe must plan as a hash-joinable key:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash join:\n$p")
  }

  test("q72: correlated scalar subqueries de-correlate to aggregate joins") {
    val p = plan("q72_scalar_subquery")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"scalar subqueries must not plan per-row nested loops:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected the de-correlated aggregate join:\n$p")
  }

  test("q73: custom as-of operator survives planning with AQE on") {
    val p = plan("q73_asof_native")
    assert(p.contains("AsofJoin"), s"expected AsofJoinExec in the plan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"the as-of must be the custom operator, not a join fallback:\n$p")
  }

  test("t08: vocabulary aggregates map-side before the single corpus shuffle") {
    val p = plan("t08_vocabulary")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"expected map-side partial aggregation of term counts:\n$p")
    assert(p.contains("term_counts"),
      s"expected the fused per-doc TermCounts pass feeding the corpus agg:\n$p")
  }

  test("t05: tf is a narrow fused explode — no per-doc count shuffle, no cache") {
    val p = plan("t05_tfidf")
    assert(p.contains("term_counts"),
      s"expected the fused TermCounts pass:\n$p")
    assert(!p.contains("InMemoryRelation") && !p.contains("InMemoryTableScan"),
      s"the tf persist was removed — no cache should appear:\n$p")
    // remaining aggregates: EXACTLY two partial+final pairs — the
    // document-frequency groupBy(term) and the broadcast corpus-size
    // count — and nothing keyed per (doc, term); the old
    // groupBy(doc_id, term) added a further pair.
    // Exact count (initial pre-AQE plan) per r11 ADVICE: the old <=5
    // slack would have admitted one reintroduced pair.
    val aggs = "HashAggregate".r.findAllIn(p).size
    assert(aggs == 4, s"unexpected aggregation stages (old per-doc count shuffle back?):\n$p")
  }

  test("t10: packing's running sum windows per stream, never globally") {
    val p = plan("t10_packing")
    assert(p.contains("windowspecdefinition(stream"),
      s"expected the cumulative token sum partitioned by stream:\n$p")
  }

  test("t08: rank window runs over the ordered-limit top-K, not the full vocabulary") {
    // the unpartitioned row_number/cum-sum window is only safe because it
    // sees ≤ topK rows: the global top-K must be taken by
    // TakeOrderedAndProject (per-partition heaps) BEFORE the window — a
    // Window whose child is the un-truncated aggregate is the 100 TB
    // single-task sort the verdict flagged
    val p = graft.operators.TextOps
      .vocabulary(Tables.load(spark, sf, "documents"), "text", topK = 30)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"expected ordered-limit top-K before ranking:\n$p")
    // the Window must sit strictly above the limit: no HashAggregate may
    // appear as a descendant-side sibling between Window and the limit
    val windowIdx = p.indexOf("Window")
    val takeIdx = p.indexOf("TakeOrderedAndProject")
    assert(windowIdx >= 0 && takeIdx > windowIdx,
      s"window must consume the limited top-K, not feed it:\n$p")
  }

  test("withRowIdScaled: no single-partition exchange, no global window") {
    // the scale-safe rowid must never funnel the frame through one task:
    // the only allowed exchanges are the range repartition and the tiny
    // broadcast of the offset table (q30's global-window form is the
    // documented small-frame-only variant this path replaces)
    val p = graft.operators.Relational.withRowIdScaled(
        Tables.load(spark, sf, "lineitem").select($"l_orderkey", $"l_linenumber"),
        Seq(col("l_orderkey"), col("l_linenumber")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      s"scale path must not gather to one partition:\n$p")
    assert(!p.contains("Window"),
      s"scale path must not use a window at all:\n$p")
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning")
        || p.contains("REPARTITION_BY_RANGE"),
      s"expected a range repartition:\n$p")
    spark.sharedState.cacheManager.clearCache()
  }

  // ---- reused-exchange single-computation guards (round 11) -------------
  // The MinHash, cosine-LSH and uncapped-Jaccard operators compute their
  // input lineage ONCE by plan shape: one explicit repartition whose
  // exchange every consumer reuses. The r10 design relied on cache-fill
  // ORDER instead (a persisted frame whose consumers raced to first-fill),
  // which regressed 2.6× at sf1 the moment an incidental eager count()
  // stopped materializing it first. These specs pin the plan property:
  // the executed plan must carry a ReusedExchange and must NOT read any
  // frame through an InMemoryTableScan. (AQE prints the final plan first;
  // cut at the Initial Plan section so assertions see only what ran.)
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("d04 uncapped Jaccard: shingle exchange reused by both join legs, no cache") {
    val p = finalPlan(graft.operators.Dedup.ngramJaccardPairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text",
      k = 3, threshold = 0.3))
    assert(p.contains("ReusedExchange"),
      s"expected the shingle repartition reused across the self-join legs:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"the uncapped branch must not persist anything:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"shingle lineage must be computed from one scan:\n$p")
  }

  test("d02 MinHash pairs: shingle frame reaches all three consumers via one exchange") {
    val p = finalPlan(graft.operators.Dedup.dedupMinHashPairs(
      Tables.load(spark, sf, "documents"), "doc_id", "text"))
    assert(p.contains("ReusedExchange"),
      s"expected the id-keyed shingle exchange reused by the verify joins:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"no persisted frame belongs in this plan:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"the corpus must be scanned and shingled once:\n$p")
  }

  test("d06 cosine LSH: signature frame reused, vectors scanned once, no cache") {
    val p = finalPlan(graft.operators.Dedup.cosineNearDupLSH(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, dim = 64, planes = 32, bands = 4))
    assert(p.contains("ReusedExchange"),
      s"expected the id-keyed signature exchange reused by the verify joins:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"no persisted frame belongs in this plan:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"the embeddings must be scanned and signed once:\n$p")
  }

  test("d06 banded cosine LSH: signature frame reused, vectors scanned once, no cache") {
    // the r14 recall-safe variant keeps the same plan contract as the
    // one-long form: one embeddings scan, one id-keyed exchange reused
    // by the band leg and both verify joins, nothing persisted
    val p = finalPlan(graft.operators.Dedup.cosineNearDupLSHBanded(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, dim = 64,
      params = graft.operators.Dedup.hyperplaneLshParamsFor(500L, 0.4)))
    assert(p.contains("ReusedExchange"),
      s"expected the id-keyed signature exchange reused by the verify joins:\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"no persisted frame belongs in this plan:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"the embeddings must be scanned and signed once:\n$p")
  }

  test("banded cosine LSH wide mode: one scan + reused exchange at the pair-sized width") {
    // force wide mode (expected pairs >> session width) with directly-
    // constructed params: the whole operator — base exchange, candidate
    // stages, both verify joins — must run at ONE pair-volume-sized
    // width with the single-scan/reused-exchange contract intact (a
    // second base exchange at a different width would re-scan and
    // re-sign the corpus)
    val params = graft.operators.Dedup.HyperplaneLshParams(
      bands = 4, rowsPerBand = 8, predictedRecall = 1.0, clamped = false,
      nRows = 50000L)
    assert(params.expectedCandidates > 2e6 * spark.sessionState.conf.numShufflePartitions)
    val p = finalPlan(graft.operators.Dedup.cosineNearDupLSHBanded(
      Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, dim = 64, params = params))
    assert(p.contains("ReusedExchange"),
      s"expected the id-keyed signature exchange reused by the verify joins:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"wide mode must not re-scan the embeddings:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"wide mode uses explicit-count exchanges (AQE must not coalesce them):\n$p")
    assert(!p.contains("InMemoryTableScan"), s"no cache:\n$p")
  }

  test("simhash wide tier: one scan + reused exchange, wide mode at the pair-sized width") {
    // r14 ADVICE: dedupSimHashPairsWide claims the banded-cosine
    // 'one width, reused exchange survives' contract but only the
    // cosine path was plan-asserted, and the wide trigger needs an
    // nRows no suite corpus reaches. Force it via the STATED corpus
    // size (the sizer input is a declared statistic, not a measured
    // count): nRows=4×10⁵ sizes 8 bands × 16 bits and an expected
    // candidate volume past the session width → wide mode. Same pins
    // as the cosine wide test: single documents scan (the sig frame
    // feeds band-explode + both verify joins through one reused
    // exchange), explicit-count repartitions, nothing persisted.
    val p = finalPlan(graft.operators.Dedup.dedupSimHashPairsWide(
      Tables.load(spark, sf, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text", nRows = 400000L))
    assert(p.contains("ReusedExchange"),
      s"expected the id-keyed signature exchange reused by the verify joins:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      s"wide mode must not re-scan and re-sign the corpus:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"wide mode uses explicit-count exchanges (AQE must not coalesce them):\n$p")
    assert(!p.contains("InMemoryTableScan"), s"no cache:\n$p")
  }

  test("d11 incremental MinHash-LSH: one corpus candidate shuffle, shared shingle exchange, no cache") {
    // r14 verdict #5's plan contract: the full corpus's band index goes
    // through exactly ONE (band, bucket) exchange — the capped-bucket
    // aggregation — and the probe side is a second, BATCH-sized
    // exchange that joins it co-partitioned (no third exchange for the
    // join). The combined shingle frame reaches the band leg and both
    // verify joins through one reused id-keyed exchange
    // (dedupMinHashPairsFrom's contract). Overlapping ranges keep the
    // re-delivery anti-join in the plan (d09 test's reasoning).
    val docs = Tables.load(spark, sf, "documents")
    val p = finalPlan(graft.operators.Dedup.minHashIncremental(
      docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 300),
      "doc_id", "text", k = 3, threshold = 0.5))
    val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(p).size
    assert(bandExchanges == 2,
      s"expected exactly 2 (band,bucket) exchanges — the corpus index " +
      s"aggregation and the batch probe leg — got $bandExchanges:\n$p")
    assert(p.contains("ReusedExchange"),
      s"expected the shared shingle exchange reused by band + verify legs:\n$p")
    assert("LeftAnti".r.findAllIn(p).size == 1,
      s"the re-delivery anti-join must appear once:\n$p")
    assert(!p.contains("InMemoryTableScan"), s"no cache:\n$p")
  }

  test("incremental cosine LSH wide mode: bucket agg AND probe leg at the pair-sized width") {
    // r15 review pass: the wide width must reach the HEAVY exchange —
    // the corpus-wide (band,bucket) bucket aggregation — not just the
    // base and probe legs; an under-wide aggregation is the sf3
    // sort-spill, and a width mismatch versus the probe leg would cost
    // a third (band,bucket) exchange. Force wide with directly-built
    // params and pin: exactly 2 (band,bucket) exchanges, explicit-N,
    // reused id-keyed base exchange, no cache.
    val emb = Tables.load(spark, sf, "embeddings")
    val params = graft.operators.Dedup.HyperplaneLshParams(
      bands = 4, rowsPerBand = 8, predictedRecall = 1.0, clamped = false,
      nRows = 50000L)
    assert(params.expectedCandidates > 2e6 * spark.sessionState.conf.numShufflePartitions)
    val p = finalPlan(graft.operators.Dedup.cosineLshIncremental(
      emb.filter(col("vec_id") < 400), emb.filter(col("vec_id") >= 300),
      "vec_id", "embedding", threshold = 0.4, dim = 64, params = params))
    val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(p).size
    assert(bandExchanges == 2,
      s"expected exactly 2 (band,bucket) exchanges at the operator width, got $bandExchanges:\n$p")
    assert(p.contains("REPARTITION_BY_NUM"),
      s"wide mode uses explicit-count exchanges:\n$p")
    assert(p.contains("ReusedExchange"), s"base exchange must be reused:\n$p")
    assert(!p.contains("InMemoryTableScan"), s"no cache:\n$p")
  }

  test("t11 stratified sample: one codegen'd filter over the scan, ZERO exchanges") {
    // the dataset-mixing primitive must stay completely narrow — no
    // shuffle, no rand(), membership decided inside the scan's filter
    // stage (a 100 TB rate-mix is a pure map over the corpus)
    val docs = Tables.load(spark, sf, "documents")
    val p = finalPlan(graft.operators.Sampling.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 0.5, "fr" -> 1.0),
      defaultRate = 0.05, seed = "s11"))
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("*(1) Filter"),
      s"filter must run inside whole-stage codegen, directly over the scan:\n$p")
    assert(p.contains("FileScan"), s"expected a bare scan underneath:\n$p")
  }

  test("t13/t14 weighted sample + hash split: narrow, zero exchanges") {
    val docs = Tables.load(spark, sf, "documents")
    val p13 = finalPlan(graft.operators.Sampling.weightedSample(
      docs, "doc_id", col("n_chars").cast("double") / lit(2000.0), "s13"))
    assert(!p13.contains("Exchange"), s"weighted sample must not shuffle:\n$p13")
    assert(p13.contains("*(1) Filter"), s"filter must codegen over the scan:\n$p13")
    val p14 = finalPlan(graft.operators.Sampling.hashSplit(
      docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), "s14"))
    assert(!p14.contains("Exchange"), s"hash split must not shuffle:\n$p14")
    // hash split drops no HASHABLE row: its only filter is the null-key
    // guard — the split column itself is a pure projection, so no
    // Filter line may mention the md5 hash point (a hash-threshold
    // filter there would mean rows are being dropped by range, the
    // samplers' job, not the splitter's)
    val p14FilterLines = p14.linesIterator.filter(_.contains("Filter")).toSeq
    assert(p14.contains("*(1) Project"),
      s"split assignment must be a codegen'd projected column:\n$p14")
    assert(p14FilterLines.forall(l => !l.contains("md5")),
      s"no hash-threshold filter may drop rows in hash split (only the " +
      s"null-key guard):\n$p14")
  }

  test("t15 budget sample: the window runs over the presample, never the corpus") {
    // the exact cumulative cut may window-sort only the md5-presampled
    // rows (≈ margin·budget per stratum): the presample Filter must sit
    // BELOW the Window in the returned plan, and exactly one Window /
    // one stratum exchange may appear
    val docs = Tables.load(spark, sf, "documents")
    val p = finalPlan(graft.operators.Sampling.budgetSample(
      docs, "source", "doc_id", "n_chars", budget = 3000L, seed = "s15"))
    assert("Window \\[".r.findAllIn(p).size == 1, s"one window:\n$p")
    val iWin = p.indexOf("Window")
    val iMd5 = p.indexOf("md5")
    assert(iWin >= 0 && iMd5 > iWin,
      s"the md5 presample filter must be below the window (a child of " +
      s"it), not above:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"one stratum exchange:\n$p")
  }

  test("t12 bottom-k per stratum: ONE exchange of k-sized partial buffers") {
    // the per-stratum exact-k sampler must use the bounded-aggregator
    // shape (partial buffers map-side, one shuffle of k-sized states),
    // never a per-stratum window sort of the corpus
    val docs = Tables.load(spark, sf, "documents")
    val p = finalPlan(graft.operators.Sampling.bottomKPerStratum(
      docs, "source", "doc_id", k = 5, seed = "s12"))
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected exactly 1 exchange (the stratum aggregation), got $exchanges:\n$p")
    assert(!p.contains("Window"), s"no window sort:\n$p")
    assert("Aggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation (map-side k-sized buffers):\n$p")
  }

  test("d13 incremental SimHash: two (band,bucket) exchanges, no verify joins, no cache") {
    // The fingerprint rides the candidate shuffle (CappedCollector of
    // (id, sig) + sig on the probe rows), so unlike d11 there is no
    // shared id-keyed exchange and no verify join: the plan's only
    // id-keyed exchanges belong to the re-delivery anti-join and the
    // pair distinct. Pin: exactly 2 (band,bucket) exchanges — corpus
    // bucket aggregation + batch probe leg, co-partitioned (the join
    // adds none) — one anti-join, and no post-candidate join at all
    // (no exchange keyed on id1/id2 other than the distinct's).
    val docs = Tables.load(spark, sf, "documents")
    val p = finalPlan(graft.operators.Dedup.simHashIncremental(
      docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 300),
      "doc_id", "text", maxHamming = 8))
    val bandExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(p).size
    assert(bandExchanges == 2,
      s"expected exactly 2 (band,bucket) exchanges — the corpus bucket " +
      s"aggregation and the batch probe leg — got $bandExchanges:\n$p")
    assert("LeftAnti".r.findAllIn(p).size == 1,
      s"the re-delivery anti-join must appear once:\n$p")
    val id1Exchanges = "Exchange hashpartitioning\\(id1".r.findAllIn(p).size
    assert(id1Exchanges <= 1,
      s"no verify joins: at most the distinct's pair exchange may key " +
      s"on id1, got $id1Exchanges:\n$p")
    assert(!p.contains("InMemoryTableScan"), s"no cache:\n$p")
  }

  test("d14 ingest index: corpus state enters the plan ONLY through broadcast probes") {
    // The no-corpus-sized-exchange pin for the carried-index ingest
    // path (r15 verdict's weak → r16 lead): in the executed pairs plan,
    // every scan of the INDEX's cached frames (identified by cache
    // builder identity, not by name) must meet a BroadcastHashJoin
    // BELOW any ShuffleExchange on its path to the root — i.e. the
    // corpus is filtered down to batch-proportional rows by a broadcast
    // hash probe before anything derived from it shuffles. Also: the
    // ingest tree reads NO files at all (batch legs enter through their
    // own per-ingest caches). AQE is disabled for the walk so the tree
    // is the static shapes, not stage wrappers.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (checks, caches) = graft.operators.OperatorCaches.scoped {
      val docs = Tables.load(spark, sf, "documents")
      val idx = graft.operators.IngestIndex.buildMinHash(
        docs.filter(col("doc_id") < 400), "doc_id", "text")
      idx.buckets.count(); idx.docs.count()
      val (pairs, _) = graft.operators.IngestIndex.ingestMinHash(idx,
        docs.filter(col("doc_id") >= 400), "text", 0.8)
      pairs.collect()
      def builderOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.withCachedData.collectFirst {
          case r: InMemoryRelation => r.cacheBuilder
        }.get
      val indexBuilders = Seq(builderOf(idx.buckets), builderOf(idx.docs))
      val plan = pairs.queryExecution.executedPlan
      // ancestor paths (nearest-first) to every index cache scan. The
      // ingest's OWN per-batch caches (batch segment, verify fetch) are
      // opaque leaves in the executed tree, so the walk recurses into
      // their cached build plans — the doc-store probe lives inside the
      // persisted fetch frame's lineage.
      def scanPaths(p: SparkPlan,
          anc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
        case s: InMemoryTableScanExec
            if indexBuilders.exists(_ eq s.relation.cacheBuilder) => Seq(anc)
        case s: InMemoryTableScanExec =>
          scanPaths(s.relation.cachedPlan, s :: anc)
        case other => other.children.flatMap(scanPaths(_, other :: anc))
      }
      val paths = scanPaths(plan, Nil)
      // top level only: the batch's one-time source read legitimately
      // lives INSIDE its per-ingest cache's build plan; the executed
      // tree proper may not touch files (the corpus never re-reads)
      val fileScans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      (paths.size, paths.map { path =>
        val iBhj = path.indexWhere(_.isInstanceOf[BroadcastHashJoinExec])
        val iShuf = path.indexWhere(_.isInstanceOf[ShuffleExchangeExec])
        (iBhj, iShuf)
      }, fileScans.size)
    }
    try {
      val (nScans, guards, nFileScans) = checks
      assert(nScans >= 2,
        s"expected the bucket index AND the doc store to be probed, got $nScans scans")
      guards.foreach { case (iBhj, iShuf) =>
        assert(iBhj >= 0, "every index scan must sit under a broadcast hash probe")
        assert(iShuf < 0 || iBhj < iShuf,
          s"an exchange sits between the corpus scan and its broadcast " +
          s"probe (bhj at $iBhj, shuffle at $iShuf) — that exchange " +
          "would be corpus-sized")
      }
      assert(nFileScans == 0,
        s"the ingest path must not read files — all state enters through " +
        s"caches; found $nFileScans FileScans")
    } finally {
      caches.release()
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("d14 ingest index: above the gate, the corpus meets the probe co-partitioned") {
    // the shuffle-route twin of the walk above (r16 verdict #1): with
    // the broadcast gate forced to 0 every probe frame rides the
    // shuffled-hash route, and the no-corpus-sized-work pin becomes —
    // every index cache scan's path to the root must reach a
    // ShuffledHashJoin with NO ShuffleExchange and NO Sort between the
    // scan and that join. The segment caches are held clustered on
    // their probe keys ((band, bucket) for the bucket index, id for
    // the doc store), so EnsureRequirements must neither insert an
    // exchange on the corpus side (that exchange would be corpus-sized)
    // nor fall back to SortMergeJoin (whose corpus-side sort is the
    // other way to pay corpus-sized work per ingest). File-scan rule
    // unchanged: the ingest tree reads no files.
    import org.apache.spark.sql.execution.{SortExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (checks, caches) = graft.operators.OperatorCaches.scoped {
      val docs = Tables.load(spark, sf, "documents")
      val idx = graft.operators.IngestIndex.buildMinHash(
        docs.filter(col("doc_id") < 400), "doc_id", "text")
      idx.buckets.count(); idx.docs.count()
      val (pairs, _) = graft.operators.IngestIndex.ingestMinHash(idx,
        docs.filter(col("doc_id") >= 400), "text", 0.8,
        broadcastGateRows = 0L)
      pairs.collect()
      def builderOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.withCachedData.collectFirst {
          case r: InMemoryRelation => r.cacheBuilder
        }.get
      val indexBuilders = Seq(builderOf(idx.buckets), builderOf(idx.docs))
      val plan = pairs.queryExecution.executedPlan
      def scanPaths(p: SparkPlan,
          anc: List[SparkPlan]): Seq[List[SparkPlan]] = p match {
        case s: InMemoryTableScanExec
            if indexBuilders.exists(_ eq s.relation.cacheBuilder) => Seq(anc)
        case s: InMemoryTableScanExec =>
          scanPaths(s.relation.cachedPlan, s :: anc)
        case other => other.children.flatMap(scanPaths(_, other :: anc))
      }
      val paths = scanPaths(plan, Nil)
      val fileScans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      (paths.size, paths.map { path =>
        (path.indexWhere(_.isInstanceOf[ShuffledHashJoinExec]),
          path.indexWhere(_.isInstanceOf[ShuffleExchangeExec]),
          path.indexWhere(_.isInstanceOf[SortExec]))
      }, fileScans.size)
    }
    try {
      val (nScans, guards, nFileScans) = checks
      assert(nScans >= 2,
        s"expected the bucket index AND the doc store to be probed, got $nScans scans")
      guards.foreach { case (iShj, iShuf, iSort) =>
        assert(iShj >= 0,
          "every index scan must sit under a shuffled hash probe on this route")
        assert(iShuf < 0 || iShj < iShuf,
          s"an exchange sits between the corpus scan and its hash probe " +
          s"(shj at $iShj, shuffle at $iShuf) — that exchange would be " +
          "corpus-sized; the segment cache's clustering was not reused")
        assert(iSort < 0 || iShj < iSort,
          s"a sort sits between the corpus scan and its hash probe " +
          s"(shj at $iShj, sort at $iSort) — a SortMergeJoin fallback " +
          "pays a corpus-sized sort per ingest")
      }
      assert(nFileScans == 0,
        s"the ingest path must not read files — all state enters through " +
        s"caches; found $nFileScans FileScans")
    } finally {
      caches.release()
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("d09 incremental Jaccard (uncapped): explicit-N exchanges, one anti-join, no cache") {
    // The uncapped incremental shape computes the corpus lineage once
    // (full-index leg only: the probe leg derives straight from the
    // batch) — so exactly ONE re-delivery anti-join may appear; both
    // legs must go through explicit-partition-count repartitions (a bare
    // repartition(col) gets AQE-coalesced to the advisory target,
    // collapsing the join's sort parallelism at scale); and nothing may
    // be persisted. A review pass caught this operator claiming (in
    // comments) exchange reuse that never fired — these assertions pin
    // what the plan actually guarantees instead.
    // OVERLAPPING corpus/batch ranges: with disjoint ranges (the d09
    // query's shape) Catalyst proves the anti-join's condition
    // unsatisfiable from the filter constraints and eliminates it
    // outright — the overlap here keeps the re-delivery semantics (and
    // its single anti-join) in the plan under test
    val docs = Tables.load(spark, sf, "documents")
    val p = finalPlan(graft.operators.Dedup.ngramJaccardIncremental(
      docs.filter(col("doc_id") < 400), docs.filter(col("doc_id") >= 300),
      "doc_id", "text", k = 3, threshold = 0.1))
    assert(p.contains("REPARTITION_BY_NUM"),
      s"expected explicit-partition-count exchanges on both join legs:\n$p")
    assert(!p.contains("REPARTITION_BY_COL"),
      s"a bare repartition(col) is AQE-coalescible — use the explicit count:\n$p")
    assert("LeftAnti".r.findAllIn(p).size == 1,
      s"the re-delivery anti-join must appear once (full-index leg only):\n$p")
    assert(!p.contains("InMemoryTableScan"),
      s"the uncapped path must not persist anything:\n$p")
  }

  test("withRowId auto-routes by size estimate: big → scaled, small → window") {
    // forcing the threshold to 0 routes any frame down the scale path —
    // the global-window footgun must be unreachable above the threshold
    val big = graft.operators.Relational.withRowId(
        Tables.load(spark, sf, "lineitem").select($"l_orderkey", $"l_linenumber"),
        Seq(col("l_orderkey"), col("l_linenumber")), smallBytesMax = 0L)
      .queryExecution.executedPlan.toString
    assert(!big.contains("SinglePartition") && !big.contains("Window"),
      s"above the threshold the scaled (window-free) path must run:\n$big")
    spark.sharedState.cacheManager.clearCache()
    graft.operators.OperatorCaches.release()
    // a dimension table sits far below the default 64 MB estimate and
    // keeps the one-window form (fewer jobs, nothing persisted)
    val small = graft.operators.Relational.withRowId(
        Tables.load(spark, sf, "region").select($"r_regionkey"),
        Seq(col("r_regionkey")))
      .queryExecution.executedPlan.toString
    assert(small.contains("Window"), s"small frame should keep the window:\n$small")
  }
}
