package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Dedup, Similarity, TextOps}

/* Shared DuckDB oracle fragments (string-built so each query's oracle
 * stays a single self-contained SQL text for the driver). */
private object CoreSql {
  /** t02's quality-score formula, verbatim. */
  val quality: String = """round((
        least(length(text) / 500.0, 1.0)
        + greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
            / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 5.0)
        + least((len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|on|for|with)\b'))
            / greatest(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS DOUBLE), 1.0)) * 5.0, 1.0)
      ) / 3.0, 4)"""
}

/** Round-4 additions: the remaining training-data-pipeline staples —
  * Gopher-style repetition/quality signals, train-vs-benchmark
  * contamination, deterministic stratified sampling, per-cluster medoid
  * selection — plus GROUPING SETS (the one grouping construct q25/q41
  * didn't cover; reachable through the reference's SQL entry points,
  * SDF.swift:295-304). */
object Core5 {
  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // Gopher-style per-doc repetition signals (TextOps.repetitionSignals):
    // token count, mean token length, top-word fraction, duplicate-bigram
    // fraction. The oracle recomputes the identical derivation with
    // DuckDB's zipped unnest/generate_subscripts tokenization.
    QueryDef("t07_repetition", (s, dir) => {
      import s.implicits._
      TextOps.repetitionSignals(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id,
              string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ') AS w
            FROM documents),
      toks AS (SELECT doc_id, unnest(w) AS term, generate_subscripts(w, 1) AS pos FROM t),
      tok AS MATERIALIZED (SELECT * FROM toks WHERE term <> ''),
      tc AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
      words AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
              round(sum(c * length(term)) * 1.0 / sum(c), 4) AS mean_word_len,
              round(max(c) * 1.0 / sum(c), 4) AS top_word_frac
            FROM tc GROUP BY 1),
      bg AS (SELECT doc_id,
              term || ' ' || lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
            FROM tok),
      bgc AS (SELECT doc_id, b, count(*) AS c FROM bg WHERE b IS NOT NULL GROUP BY 1, 2),
      dup AS (SELECT doc_id, round((sum(c) - count(*)) * 1.0 / sum(c), 4) AS dup_bigram_frac
            FROM bgc GROUP BY 1)
      SELECT words.doc_id, n_words, mean_word_len, top_word_frac,
             coalesce(dup_bigram_frac, 0.0) AS dup_bigram_frac
      FROM words LEFT JOIN dup USING (doc_id) ORDER BY doc_id""")),

    // Benchmark-contamination check (Dedup.contamination): which training
    // docs (source <> 'src0') share 5-word grams with the held-out
    // benchmark slice (source = 'src0'), and how many distinct grams.
    // Spark side joins 8-byte gram hashes against the broadcast benchmark
    // gram set; the oracle recomputes with the literal gram strings.
    QueryDef("d08_contamination", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Dedup.contamination(
          docs.filter($"source" =!= "src0"), docs.filter($"source" === "src0"),
          "doc_id", "text", k = 5)
        .orderBy($"doc_id")
    }, Some("""
      WITH t AS (SELECT doc_id, source,
              regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
            FROM documents),
      sh AS MATERIALIZED (SELECT doc_id, source, list_distinct(CASE WHEN len(w) >= 5
               THEN list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))
               ELSE [array_to_string(w, ' ')] END) AS sh FROM t),
      bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE source = 'src0'),
      tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE source <> 'src0')
      SELECT doc_id, CAST(count(DISTINCT tr.g) AS BIGINT) AS n_shared
      FROM tr JOIN bench USING (g)
      GROUP BY doc_id ORDER BY doc_id""")),

    // Per-cluster medoid (Similarity.clusterMedoids): the corpus member
    // closest to its label's mean vector — centroids by partial-aggregated
    // posexplode, arg-min by max_by, distances rounded before selection so
    // float summation order can't flip the winner.
    QueryDef("s05_cluster_medoid", (s, dir) => {
      import s.implicits._
      Similarity.clusterMedoids(t(s, dir, "embeddings"), "label")
        .orderBy($"label")
    }, Some("""
      WITH e AS (SELECT vec_id, label, unnest(embedding) AS x,
                        generate_subscripts(embedding, 1) AS i FROM embeddings),
      cent AS (SELECT label, i, avg(x) AS c FROM e GROUP BY 1, 2),
      d AS (SELECT e.label, vec_id, round(sum((x - c) * (x - c)), 4) AS d2
            FROM e JOIN cent ON e.label = cent.label AND e.i = cent.i GROUP BY 1, 2),
      r AS (SELECT label, vec_id, d2,
                   row_number() OVER (PARTITION BY label ORDER BY d2, vec_id) AS rk
            FROM d)
      SELECT label, vec_id, d2 FROM r WHERE rk = 1 ORDER BY label""")),

    // Deterministic stratified sampling: per-language fixed-k sample by
    // md5 order (a hash-ordered take-k is a deterministic reservoir — no
    // RNG state, identical on any cluster size), plus the rate-based
    // membership flag (first hex digit < '4' ≈ 25%). md5-over-id is
    // engine-portable so the oracle reproduces the exact sample.
    // NOTE: this query predates `operators/Sampling` and keeps the
    // WINDOW-sorted form as the teaching twin (the q33/q82 pattern) —
    // production callers use Sampling.bottomKPerStratum (one exchange of
    // k-sized bounded-agg buffers, t12) and Sampling.stratifiedSample
    // (zero-exchange rate mixing, t11) instead of sorting each stratum.
    QueryDef("q62_stratified_sample", (s, dir) => {
      import s.implicits._
      val h = md5($"doc_id".cast(StringType).cast(BinaryType))
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      t(s, dir, "documents")
        .select($"lang", $"doc_id", h.as("h"))
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .filter($"rk" <= 5)
        .select($"lang", $"doc_id", $"rk",
          substring($"h", 1, 1).isin("0", "1", "2", "3").cast(IntegerType).as("in_quarter"))
        .orderBy($"lang", $"rk")
    }, Some("""
      WITH h AS (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
      r AS (SELECT lang, doc_id, h,
                   CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rk
            FROM h)
      SELECT lang, doc_id, rk,
             CAST(substr(h, 1, 1) IN ('0', '1', '2', '3') AS INT) AS in_quarter
      FROM r WHERE rk <= 5 ORDER BY lang, rk""")),

    // GROUPING SETS with grouping_id — the explicit-sets form (q25 ROLLUP
    // and q41 CUBE are the derived forms). Through the SQL entry point on
    // both engines; gid + coalesced keys make the output total-ordered.
    QueryDef("q63_grouping_sets", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               CAST(grouping_id(l_returnflag, l_linestatus) AS INT) AS gid,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, rf, ls""")
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY gid, rf, ls""")),

    // The end-to-end training-data-prep pipeline, composed from the
    // library's own operators in one declarative plan: quality filter →
    // exact dedup (min-id representative) → benchmark decontamination
    // (anti-join against the broadcast gram probe) → deterministic 50%
    // sample. Every stage is individually oracled elsewhere (t02, d01,
    // d08, q62); this query pins their COMPOSITION against a from-scratch
    // SQL recompute of the whole pipeline.
    QueryDef("p01_prep_pipeline", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val bench = docs.filter($"source" === "src0")
      val train = docs.filter($"source" =!= "src0")
      val scored = train.select($"doc_id", $"lang", $"text",
          TextOps.tokenCount($"text").cast(LongType).as("ws_tokens"),
          TextOps.qualityScore($"text").as("quality"))
        .filter($"quality" >= 0.55)
      val deduped = Dedup.dedupExact(scored, "doc_id", "text")
      val contaminated = Dedup.contamination(train, bench, "doc_id", "text", k = 5)
        .select($"doc_id")
      deduped.join(contaminated, Seq("doc_id"), "left_anti")
        .filter(substring(md5($"doc_id".cast(StringType).cast(BinaryType)), 1, 1) < "8")
        .select($"doc_id", $"lang", $"ws_tokens", $"quality")
        .orderBy($"doc_id")
    }, Some(s"""
      WITH train AS (SELECT * FROM documents WHERE source <> 'src0'),
      q AS (SELECT doc_id, lang, text,
              CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
              ${CoreSql.quality} AS quality
            FROM train),
      qf AS (SELECT * FROM q WHERE quality >= 0.55),
      dd AS (SELECT *, row_number() OVER (
               PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               ORDER BY doc_id) AS rn FROM qf),
      dedup AS (SELECT doc_id, lang, ws_tokens, quality FROM dd WHERE rn = 1),
      t2 AS (SELECT doc_id, source,
              regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
            FROM documents),
      sh AS MATERIALIZED (SELECT doc_id, source, list_distinct(CASE WHEN len(w) >= 5
               THEN list_transform(range(1, len(w) - 3), i -> array_to_string(w[i:i+4], ' '))
               ELSE [array_to_string(w, ' ')] END) AS sh FROM t2),
      bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE source = 'src0'),
      contaminated AS (SELECT DISTINCT doc_id FROM
        (SELECT doc_id, unnest(sh) AS g FROM sh WHERE source <> 'src0') tr
        JOIN bench USING (g))
      SELECT doc_id, lang, ws_tokens, quality FROM dedup
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
      ORDER BY doc_id""")),

    // Stream-static join — the one Structured Streaming join shape not yet
    // covered (e04 is stream-stream): each micro-batch hash-joins against
    // the broadcast static dimension, stateless (no watermark needed on
    // the static side). Purchases enriched with the customer segment,
    // aggregated on the materialized result; oracle = the batch join.
    QueryDef("e06_stream_enrich", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      import org.apache.spark.sql.streaming.OutputMode
      val name = "e06_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
        .filter($"event_type" === "purchase")
      val dim = broadcast(t(s, dir, "customer").select($"c_custkey", $"c_mktsegment"))
      val joined = stream.join(dim, $"user_id" === $"c_custkey")
        .select($"event_id", $"c_mktsegment", $"value")
      EventStreams.withShufflePartitions(s, 4) {
        EventStreams.runToMemory(s, joined, name, OutputMode.Append())
      }.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"c_mktsegment")
    }, Some("""
      SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events JOIN customer ON user_id = c_custkey
      WHERE event_type = 'purchase'
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Explicit NULLS FIRST/LAST ordering (O1): Spark's ASC default is
    // nulls-first, DuckDB's is nulls-last — only explicit placement is
    // portable. The driver's compare sorts rows before hashing, so raw
    // ORDER BY placement is unobservable; a LIMIT after each ordered
    // branch makes the placement decide CONTENT (top-20 descending with
    // NULLS LAST must exclude nulls; head-5 ascending with NULLS FIRST
    // must be all nulls).
    QueryDef("q64_nulls_order", (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "events").filter($"event_id" < 200)
        .select($"event_id",
          when($"event_type" === "error", lit(null))
            .otherwise(round($"value", 2)).as("v"))
      val top = base.orderBy($"v".desc_nulls_last, $"event_id").limit(20)
        .withColumn("part", lit(1))
      val nulls = base.orderBy($"v".asc_nulls_first, $"event_id").limit(5)
        .withColumn("part", lit(2))
      top.unionByName(nulls).select($"part", $"event_id", $"v")
        .orderBy($"part", $"event_id")
    }, Some("""
      WITH base AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE round(value, 2) END AS v
        FROM events WHERE event_id < 200)
      SELECT part, event_id, v FROM (
        (SELECT 1 AS part, event_id, v FROM base
         ORDER BY v DESC NULLS LAST, event_id LIMIT 20)
        UNION ALL
        (SELECT 2 AS part, event_id, v FROM base
         ORDER BY v ASC NULLS FIRST, event_id LIMIT 5)) u
      ORDER BY part, event_id""")),

    // foreachBatch sink with idempotent overwrite (the production pattern
    // the memory sink can't show): Complete-mode per-type totals rewritten
    // whole each micro-batch — a replayed batch rewrites identical content
    // (exactly-once by construction). Oracle = the batch aggregation.
    QueryDef("e07_foreach_batch", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      // fixed path + overwrite: repeated bench/verify runs reuse one
      // directory instead of littering a fresh temp dir per invocation
      val out = new java.io.File(
        sys.props("java.io.tmpdir"), "graft_e07_out").getAbsolutePath
      val agg = EventStreams.readEventStream(s, dir)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      EventStreams.withShufflePartitions(s, 4) {
        EventStreams.runForeachBatchOverwrite(s, agg, out)
      }.orderBy($"event_type")
    }, Some("""
      SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // Incremental dedup: the ingest batch (doc_id >= 400) checked for
    // near-dups against the already-accepted corpus (doc_id < 400) and
    // itself — corpus-internal pairs never generated (the append-only
    // production shape; d04 is the from-scratch equivalent). The oracle
    // recomputes the O(corpus × batch) restriction from scratch; with
    // monotone batch ids, "at least one side new" ≡ id2 >= 400.
    QueryDef("d09_dedup_incremental", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      Dedup.ngramJaccardIncremental(
          docs.filter($"doc_id" < 400), docs.filter($"doc_id" >= 400),
          "doc_id", "text", k = 3, threshold = 0.1)
        .orderBy($"id1", $"id2")
    }, Some("""
      WITH t AS (SELECT doc_id,
              regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
            FROM documents),
      sh AS MATERIALIZED (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
               THEN list_transform(range(1, len(w) - 1), i -> array_to_string(w[i:i+2], ' '))
               ELSE [array_to_string(w, ' ')] END) AS sh FROM t),
      p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
              round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id AND b.doc_id >= 400)
      SELECT id1, id2, jaccard FROM p WHERE jaccard >= 0.1 ORDER BY id1, id2""")),

    // SQLite arithmetic semantics over signed operands (§2.8): integer
    // division truncates toward zero (SDF delegates to SQLite's VDBE,
    // which is C semantics), `%` takes the dividend's sign, `/` on a
    // cast is true division. Spark `div`/`%` and DuckDB `//`/`%` share
    // exactly these rules — the query pins that three-way agreement on
    // negative operands, where floor-division dialects would diverge.
    QueryDef("q65_int_div", (s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .select(($"n_nationkey" - 12).as("a"), ($"n_regionkey" - 2).as("b"))
        .filter($"b" =!= 0)
        .selectExpr("a", "b", "a div b AS idiv", "a % b AS imod",
          "round(CAST(a AS DOUBLE) / b, 4) AS fdiv")
        .orderBy($"a", $"b")
    }, Some("""
      SELECT a, b, a // b AS idiv, a % b AS imod,
             round(CAST(a AS DOUBLE) / b, 4) AS fdiv
      FROM (SELECT n_nationkey - 12 AS a, n_regionkey - 2 AS b FROM nation)
      WHERE b <> 0 ORDER BY a, b""")),

    // Spark 4's transformWithState (the successor to flatMapGroupsWithState:
    // typed ValueState handles, TTL, timers, RocksDB-backed store): per-user
    // cumulative totals folded into state per micro-batch. The finite
    // single-batch replay emits exactly one cumulative row per user, which
    // the batch aggregation oracle hash-matches.
    QueryDef("e08_transform_with_state", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      val name = "e08_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.Event]
      EventStreams.withShufflePartitions(s, 4) {
        EventStreams.runningTotals(s, stream, name)
      }.select($"user_id", $"n", round($"total_value", 2).as("total_value"))
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // SQLite CAST semantics (SQLiteExprs.sqliteCastInt/Real): longest
    // numeric prefix, leading spaces ignored, 0 when no prefix, int64
    // clamp on overflow — CAST never errors in SQLite, the opposite of
    // Spark's ANSI cast. The oracle re-derives the identical rules in
    // DuckDB SQL over the same inline value list.
    QueryDef("q66_sqlite_cast", (s, dir) => {
      import s.implicits._
      import graft.functions.SQLiteExprs
      Seq("12abc", "abc", "  42", "\t42", "-3.9xyz", "3.9",
          "99999999999999999999999", "-00099999999999999999999999",
          "0000000005", "1e3", ".5e1x", "+7", "", "0x1A",
          "9223372036854775807", "-9223372036854775808")
        .toDF("sv")
        .select($"sv", SQLiteExprs.sqliteCastInt($"sv").as("i"),
          SQLiteExprs.sqliteCastReal($"sv").as("r"))
        .orderBy($"sv")
    }, Some("""
      WITH vals(sv) AS (VALUES ('12abc'), ('abc'), ('  42'), (chr(9) || '42'), ('-3.9xyz'), ('3.9'),
        ('99999999999999999999999'), ('-00099999999999999999999999'),
        ('0000000005'), ('1e3'), ('.5e1x'), ('+7'), (''), ('0x1A'),
        ('9223372036854775807'), ('-9223372036854775808')),
      parts AS (SELECT sv, regexp_replace(sv, '^[ \t\n\x0B\f\r]+', '') AS t FROM vals),
      pieces AS (SELECT sv,
          regexp_extract(t, '^([+-])', 1) AS sign,
          regexp_extract(t, '^[+-]?0*([0-9]+)', 1) AS digits,
          regexp_extract(t, '^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)([eE][+-]?[0-9]+)?', 0) AS rp
        FROM parts)
      SELECT sv,
        CASE WHEN digits = '' THEN 0
             WHEN length(digits) > 19 THEN
               CASE WHEN sign = '-' THEN (-9223372036854775807 - 1) ELSE 9223372036854775807 END
             ELSE CAST(CASE
                    WHEN CAST(sign || digits AS HUGEINT) > 9223372036854775807
                      THEN CAST(9223372036854775807 AS HUGEINT)
                    WHEN CAST(sign || digits AS HUGEINT) < -9223372036854775807 - 1
                      THEN CAST(-9223372036854775807 - 1 AS HUGEINT)
                    ELSE CAST(sign || digits AS HUGEINT) END AS BIGINT) END AS i,
        CASE WHEN rp = '' THEN 0.0 ELSE CAST(rp AS DOUBLE) END AS r
      FROM pieces ORDER BY sv""")),

    // SQLite substr() edge semantics (SQLiteExprs.sqliteSubstr): virtual
    // position 0 consumes length, negative start counts from the right,
    // negative length takes the chars PRECEDING the start. Spark's
    // substring diverges on all three; DuckDB's substr matches SQLite
    // exactly, so the oracle is the plain function.
    QueryDef("q67_substr_sqlite", (s, dir) => {
      import s.implicits._
      import graft.functions.SQLiteExprs.sqliteSubstr
      t(s, dir, "nation")
        .select($"n_nationkey", $"n_name",
          sqliteSubstr($"n_name", 2, Some(3)).as("mid"),
          sqliteSubstr($"n_name", -3, None).as("tail3"),
          sqliteSubstr($"n_name", 0, Some(3)).as("zero3"),
          sqliteSubstr($"n_name", 3, Some(-2)).as("before3"),
          sqliteSubstr($"n_name", -1, Some(-2)).as("beforelast"))
        .orderBy($"n_nationkey")
    }, Some("""
      SELECT n_nationkey, n_name,
             substr(n_name, 2, 3) AS mid,
             substr(n_name, -3) AS tail3,
             substr(n_name, 0, 3) AS zero3,
             substr(n_name, 3, -2) AS before3,
             substr(n_name, -1, -2) AS beforelast
      FROM nation ORDER BY n_nationkey"""))
  )
}
