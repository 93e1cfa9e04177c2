package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.SQLiteExprs
import graft.operators.{Dedup, Relational, TextOps}

private object Core6Sql {
  /** t02's quality formula with the stopword profile as a parameter —
    * the oracle side of TextOps.qualityScoreFor. */
  def quality(words: Seq[String]): String = s"""round((
        least(length(text) / 500.0, 1.0)
        + greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
            / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 5.0)
        + least((len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b'))
            / greatest(CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS DOUBLE), 1.0)) * 5.0, 1.0)
      ) / 3.0, 4)"""
}

/** Round-4 (cont.) additions: SQLite collation/NULL-semantics fidelity
  * (NOCASE, scalar min/max NULL propagation, IS NOT DISTINCT FROM, LIKE
  * ESCAPE, quote()), correlated scalar subqueries through the SQL entry
  * point, and two more corpus-pipeline staples (vocabulary/Zipf table,
  * per-source duplication report) plus the stream-stream LEFT OUTER join. */
object Core6 {
  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // SQLite NOCASE collation (sqlite.org/datatype3.html#collation):
    // ASCII-only case folding — 'É' and 'é' stay DISTINCT under NOCASE
    // while plain-ASCII case variants merge. Grouping on the translate
    // key is the faithful lowering (lower() would over-merge the accented
    // pair); the oracle replicates the A–Z fold with DuckDB's translate.
    QueryDef("q68_collate_nocase", (s, dir) => {
      import s.implicits._
      val nation = t(s, dir, "nation")
      val a = nation.select(concat(upper($"n_name"),
        when($"n_nationkey" % 5 === 0, lit("É")).otherwise(lit(""))).as("name"))
      val b = nation.select(concat(lower($"n_name"),
        when($"n_nationkey" % 5 === 0, lit("é")).otherwise(lit(""))).as("name"))
      a.unionByName(b)
        .groupBy(SQLiteExprs.nocaseKey($"name").as("nk"))
        .agg(count(lit(1)).as("n"), min($"name").as("mn"), max($"name").as("mx"))
        .orderBy($"nk")
    }, Some("""
      WITH u AS (
        SELECT upper(n_name) || CASE WHEN n_nationkey % 5 = 0 THEN 'É' ELSE '' END AS name
        FROM nation
        UNION ALL
        SELECT lower(n_name) || CASE WHEN n_nationkey % 5 = 0 THEN 'é' ELSE '' END AS name
        FROM nation)
      SELECT translate(name, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') AS nk,
             count(*) AS n, min(name) AS mn, max(name) AS mx
      FROM u GROUP BY 1 ORDER BY nk""")),

    // SQLite scalar max(X,Y)/min(X,Y) return NULL when ANY argument is
    // NULL (sqlite.org/lang_corefunc.html) — q52 pinned the skip-NULLs
    // greatest/least surface; this pins SQLite's propagate-NULL rule.
    QueryDef("q69_minmax_null", (s, dir) => {
      import s.implicits._
      t(s, dir, "events").filter($"event_id" < 3000)
        .select($"event_id",
          round($"value", 2).as("a"),
          when($"event_type" === "error", lit(null).cast(DoubleType))
            .otherwise(lit(50.0) - round($"value", 2)).as("b"))
        .select($"event_id", $"a", $"b",
          SQLiteExprs.sqliteMaxScalar($"a", $"b").as("mx"),
          SQLiteExprs.sqliteMinScalar($"a", $"b").as("mn"))
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id, a, b,
             CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE greatest(a, b) END AS mx,
             CASE WHEN a IS NULL OR b IS NULL THEN NULL ELSE least(a, b) END AS mn
      FROM (SELECT event_id, round(value, 2) AS a,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE 50.0 - round(value, 2) END AS b
            FROM events WHERE event_id < 3000) x
      ORDER BY event_id""")),

    // SQLite `IS` / `IS NOT` (null-safe equality, sqlite.org/lang_expr
    // .html#isisnot) as a JOIN key: Spark's <=> (EqualNullSafe) is a
    // valid equi-join key, so the plan is a hash join, not a nested loop
    // — NULL keys match each other instead of dropping out.
    QueryDef("q70_nullsafe_join", (s, dir) => {
      import s.implicits._
      val l = t(s, dir, "customer").select($"c_custkey",
        when($"c_nationkey" % 7 === 0, lit(null).cast(LongType))
          .otherwise($"c_nationkey").as("lk"))
      val r = t(s, dir, "nation").select($"n_name",
        when($"n_nationkey" % 7 === 0, lit(null).cast(LongType))
          .otherwise($"n_nationkey").as("rk"))
      l.join(r, $"lk" <=> $"rk", "inner")
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy($"n_name")
    }, Some("""
      WITH l AS (SELECT c_custkey,
              CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS lk
            FROM customer),
      r AS (SELECT n_name,
              CASE WHEN n_nationkey % 7 = 0 THEN NULL ELSE n_nationkey END AS rk
            FROM nation)
      SELECT n_name, count(*) AS n_cust
      FROM l JOIN r ON l.lk IS NOT DISTINCT FROM r.rk
      GROUP BY 1 ORDER BY 1""")),

    // SQLite `LIKE pattern ESCAPE esc`: the escaped `_` is literal, so
    // 'id!_1%' (escape '!') matches only the '_'-separated tags while the
    // unescaped 'id_1%' also accepts the 'x' separator — the two match
    // columns differ exactly where escaping matters. Case-insensitive
    // default throughout ('ID' rows match the lowercase pattern).
    QueryDef("q71_like_escape", (s, dir) => {
      import s.implicits._
      val rows = t(s, dir, "customer").filter($"c_custkey" <= 300)
        .select($"c_custkey",
          concat(
            when($"c_custkey" % 2 === 0, lit("ID")).otherwise(lit("id")),
            when($"c_custkey" % 3 === 0, lit("_")).otherwise(lit("x")),
            $"c_custkey".cast(StringType), lit("%"), lower($"c_name")).as("tag"))
      rows.select($"c_custkey", $"tag",
          SQLiteExprs.sqliteLikeEscape($"tag", "id!_1%", '!').as("m_esc"),
          SQLiteExprs.sqliteLike($"tag", "id_1%").as("m_raw"))
        .filter($"m_esc" || $"m_raw")
        .orderBy($"c_custkey")
    }, Some("""
      WITH r AS (SELECT c_custkey,
              (CASE WHEN c_custkey % 2 = 0 THEN 'ID' ELSE 'id' END) ||
              (CASE WHEN c_custkey % 3 = 0 THEN '_' ELSE 'x' END) ||
              CAST(c_custkey AS VARCHAR) || '%' || lower(c_name) AS tag
            FROM customer WHERE c_custkey <= 300)
      SELECT c_custkey, tag,
             tag ILIKE 'id!_1%' ESCAPE '!' AS m_esc,
             tag ILIKE 'id_1%' AS m_raw
      FROM r WHERE (tag ILIKE 'id!_1%' ESCAPE '!') OR (tag ILIKE 'id_1%')
      ORDER BY c_custkey""")),

    // Correlated scalar subqueries in the SELECT list, through the SQL
    // entry point (SDF.swift:295-304) — Catalyst rewrites each into a
    // left outer aggregate join, so the plan stays hash-join shaped
    // instead of re-executing the subquery per row.
    QueryDef("q72_scalar_subquery", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n_name,
               (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
               (SELECT round(avg(c_acctbal), 2) FROM customer
                 WHERE c_nationkey = n_nationkey) AS avg_bal
        FROM nation ORDER BY n_name""")
    }, Some("""
      SELECT n_name,
             (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
             (SELECT round(avg(c_acctbal), 2) FROM customer
               WHERE c_nationkey = n_nationkey) AS avg_bal
      FROM nation ORDER BY n_name""")),

    // SQLite quote() over variant cells: text wrapped in single quotes
    // with embedded quotes doubled, numbers as their rendering, NULL as
    // the keyword — the read-back form of the reference's typed binds
    // (SDF.swift:578-623).
    // Real cells span three magnitude decades (×1, ×1e8, ×1e16 via
    // exponent-suffix parsing — "12.31e8") to pin the SQLite %!.15g
    // rendering through its regimes: plain decimal, large fixed-notation
    // (where a naive double cast flips to Java's 1.2E9 scientific), and
    // forced-point scientific (1.231e+17, never 1231e14). Scaling by
    // PARSING a short decimal string — not by float multiplication —
    // guarantees each real is the double nearest a few-digit decimal, so
    // %!.15g always round-trips and SQLite's exact-%.20e fallback (whose
    // trailing digits come from SQLite's own approximate float decode,
    // not a correctly-rounded conversion) never triggers; that fallback
    // is the documented limit of sqliteRealString. Oracle rebuilds the
    // rendering from DuckDB's C-style printf('%.15g') by re-pointing the
    // mantissa.
    QueryDef("c06_quote", (s, dir) => {
      import s.implicits._
      val sfx = when($"event_id" % 3 === 1, lit("e8"))
        .when($"event_id" % 3 === 2, lit("e16")).otherwise(lit(""))
      t(s, dir, "events").filter($"event_id" < 1000)
        .select($"event_id",
          when($"event_id" % 4 === 0, lit("int"))
            .when($"event_id" % 4 === 1, lit("real"))
            .when($"event_id" % 4 === 2, lit("text"))
            .otherwise(lit(null).cast(StringType)).as("ty"),
          when($"event_id" % 4 === 0, floor($"value").cast(LongType).cast(StringType))
            .when($"event_id" % 4 === 1,
              concat(round($"value", 2).cast(StringType), sfx))
            .otherwise(concat($"event_type", lit("'"), $"props")).as("raw"))
        .select($"event_id",
          SQLiteExprs.quoteVariant(SQLiteExprs.toVariant($"raw", $"ty")).as("q"))
        .orderBy($"event_id")
    }, Some("""
      WITH g AS (
        SELECT event_id,
               printf('%.15g', CAST(CAST(round(value, 2) AS VARCHAR) ||
                 CASE WHEN event_id % 3 = 1 THEN 'e8'
                      WHEN event_id % 3 = 2 THEN 'e16' ELSE '' END
                 AS DOUBLE)) AS r
        FROM events)
      SELECT e.event_id,
             CASE WHEN e.event_id % 4 = 0 THEN CAST(CAST(floor(e.value) AS BIGINT) AS VARCHAR)
                  WHEN e.event_id % 4 = 1 THEN
                    CASE WHEN round(e.value, 2) = 0 THEN '0.0'
                         WHEN g.r LIKE '%.%' THEN g.r
                         WHEN g.r LIKE '%e%' THEN replace(g.r, 'e', '.0e')
                         ELSE g.r || '.0' END
                  WHEN e.event_id % 4 = 2 THEN
                    '''' || replace(e.event_type || '''' || e.props, '''', '''''') || ''''
                  ELSE 'NULL' END AS q
      FROM events e JOIN g USING (event_id) WHERE e.event_id < 1000
      ORDER BY e.event_id""")),

    // Corpus vocabulary / Zipf table (TextOps.vocabulary): global term
    // counts, frequency rank, cumulative coverage — the tokenizer/BPE
    // vocab-selection input. One partial+final agg over the corpus; the
    // rank window runs over the aggregated vocabulary only.
    QueryDef("t08_vocabulary", (s, dir) => {
      import s.implicits._
      TextOps.vocabulary(t(s, dir, "documents"), "text", topK = 30)
        .orderBy($"rnk")
    }, Some("""
      WITH t AS (SELECT string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ') AS w
            FROM documents),
      tok AS (SELECT unnest(w) AS term FROM t),
      tc AS (SELECT term, count(*) AS cnt FROM tok WHERE term <> '' GROUP BY 1),
      tot AS (SELECT sum(cnt) AS total FROM tc),
      r AS (SELECT term, cnt,
              CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT) AS rnk,
              sum(cnt) OVER (ORDER BY cnt DESC, term) AS cum
            FROM tc)
      SELECT rnk, term, cnt, round(cum * 1.0 / total, 4) AS cum_frac
      FROM r, tot WHERE rnk <= 30 ORDER BY rnk""")),

    // Per-source duplication report: for each source, its doc count,
    // within-source near-dup pairs (d04's exact-jaccard pairs restricted
    // to same-source endpoints), distinct docs involved, and the dup
    // fraction — the data-quality dashboard over the dedup operator's
    // output. The pair frame is tiny next to the corpus, so both
    // source-tag joins broadcast. t = 0.5 is the production setting (r5
    // verdict #1): it engages the AllPairs prefix filter, so candidate
    // generation stays sub-quadratic at scale — a dup DASHBOARD wants
    // real near-dups, not the j≥0.1 noise floor (which remains covered
    // exactly, and benched, by d04 — the operator's own oracle query).
    QueryDef("d10_dup_by_source", (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      // r17 optimizations (OPTIMIZATION_r17.md, guide §2.3/§2.4):
      // 1. The report only consumes SAME-SOURCE pairs, so the restriction
      //    is pushed into the candidate equi-join key (shingle, source)
      //    via ngramJaccardPairsWithin instead of generating every
      //    cross-source pair and filtering it after two source-tag joins
      //    — cross-source candidates (~19/20 of the volume at 20 uniform
      //    sources) never reach the pair-dedup exchange or the
      //    verification joins (spec-pinned Within == filtered plain).
      // 2. n_pairs and n_dup_docs both reduce over the pair frame keyed
      //    by source, so ONE aggregation over the exploded endpoints
      //    yields both (each pair contributes exactly two endpoint rows
      //    ⇒ n_pairs = count/2, exact; n_dup_docs = countDistinct) —
      //    this replaced a four-consumer persisted frame (two dupDocs
      //    union arms + two aggregates), its distinct, and one of two
      //    20-row SortMergeJoins; `within` is now single-consumer, so
      //    the old MEMORY_AND_DISK persist is dropped outright.
      // Same output (oracle text unchanged); isolated sf0.1 bench
      // 4.65 → 2.38 s (plans/r17/d10_dup_by_source_{before,after}.txt).
      val within = Dedup.ngramJaccardPairsWithin(docs, "doc_id", "text",
        groupCol = "source", k = 3, threshold = 0.5)
      val stats = within
        .select($"source", explode(array($"id1", $"id2")).as("doc_id"))
        .groupBy($"source")
        .agg((count(lit(1)) / 2).cast(LongType).as("n_pairs"),
          countDistinct($"doc_id").as("n_dup_docs"))
      t(s, dir, "documents").groupBy($"source").agg(count(lit(1)).as("n_docs"))
        .join(broadcast(stats), Seq("source"), "left")
        .select($"source", $"n_docs",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"n_dup_docs", lit(0L)).as("n_dup_docs"),
          round(coalesce($"n_dup_docs", lit(0L)).cast(DoubleType) / $"n_docs", 4)
            .as("dup_frac"))
        .orderBy($"source")
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
            FROM sh a, sh b WHERE a.doc_id < b.doc_id),
      pr AS MATERIALIZED (SELECT id1, id2 FROM p WHERE jaccard >= 0.5),
      d AS (SELECT doc_id, source FROM documents),
      w2 AS (SELECT d1.source, id1, id2 FROM pr
             JOIN d d1 ON pr.id1 = d1.doc_id JOIN d d2 ON pr.id2 = d2.doc_id
             WHERE d1.source = d2.source),
      dd AS (SELECT DISTINCT source, doc_id FROM
              (SELECT source, id1 AS doc_id FROM w2
               UNION ALL SELECT source, id2 FROM w2) u),
      ns AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
      SELECT ns.source, n_docs,
             CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
             CAST(coalesce(nd.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
             round(coalesce(nd.n_dup_docs, 0) * 1.0 / n_docs, 4) AS dup_frac
      FROM ns
      LEFT JOIN (SELECT source, count(*) AS n_pairs FROM w2 GROUP BY 1) np USING (source)
      LEFT JOIN (SELECT source, count(*) AS n_dup_docs FROM dd GROUP BY 1) nd USING (source)
      ORDER BY source""")),

    // Blob scalar surface: zeroblob / hex / unhex round-trip and binary
    // length (SQLite's blob core functions; 'blob' is the storage class
    // the variant of c04/c05 doesn't carry — it lives in binary columns,
    // see operators.Multimodal). Rendered as hex text so both engines
    // compare portable values.
    QueryDef("q74_blob_funcs", (s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .select($"n_nationkey",
          hex(SQLiteExprs.zeroblob($"n_nationkey" % 4)).as("zb"),
          hex($"n_name".cast(BinaryType)).as("hx"),
          length(unhex(hex($"n_name".cast(BinaryType)))).cast(LongType).as("rt_len"))
        .orderBy($"n_nationkey")
    }, Some("""
      SELECT n_nationkey,
             repeat('00', CAST(n_nationkey % 4 AS INT)) AS zb,
             hex(n_name) AS hx,
             CAST(octet_length(from_hex(hex(n_name))) AS BIGINT) AS rt_len
      FROM nation ORDER BY n_nationkey""")),

    // The custom physical as-of join (graft.plans.AsofJoinExec — the
    // whole-operator rung of the §7.3 extension ladder: LogicalPlan +
    // Strategy + SparkPlan, planned like a SortMergeJoin and merged in
    // one forward pass). Same query shape and oracle as q44, which runs
    // the composed union+window form — the two implementations are each
    // other's differential check, and DuckDB's native ASOF JOIN arbitrates.
    QueryDef("q73_asof_native", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_event"), $"user_id", $"ts")
      Relational.asofJoinNative(purchases, clicks, "user_id", "ts", "ts",
          rightPayload = Seq("click_event"), strict = true)
        .select($"event_id", $"user_id", $"click_event".as("click_id"))
        .orderBy($"event_id")
    }, Some("""
      SELECT p.event_id, p.user_id, c.event_id AS click_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts > c.ts
      ORDER BY p.event_id""")),

    // group_concat(DISTINCT x) — the dedup variant q34 doesn't cover
    // (SQLite supports DISTINCT with the default ',' separator only):
    // collect_set + sort for a deterministic rendering on both engines.
    QueryDef("q75_group_concat_distinct", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(array_join(array_sort(collect_set($"o_orderstatus")), ",")
            .as("statuses"),
          countDistinct($"o_orderstatus").cast(LongType).as("n_distinct"))
        .orderBy($"o_orderpriority")
    }, Some("""
      SELECT o_orderpriority,
             string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct
      FROM orders GROUP BY 1 ORDER BY 1""")),

    // transformWithState ListState (e08 covers ValueState): each user's
    // most recent 3 events kept in a bounded per-key buffer, re-bounded
    // every micro-batch — state is n×keys regardless of throughput, the
    // "last N actions" feature shape. The single-batch replay emits one
    // buffer summary per user, which the batch window-top-3 oracle pins
    // (count, sum, and the max event-time in the buffer).
    QueryDef("e10_list_state", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      val name = "e10_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.Event]
      EventStreams.withShufflePartitions(s, 4) {
        EventStreams.lastNValues(s, stream, name, n = 3)
      }.select($"user_id", $"n_last", round($"lastn_sum", 2).as("lastn_sum"),
          $"last_ts")
        .orderBy($"user_id")
    }, Some("""
      WITH r AS (SELECT user_id, value, ts, event_id,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rk
            FROM events)
      SELECT user_id, count(*) AS n_last, round(sum(value), 2) AS lastn_sum,
             max(epoch_us(ts)) AS last_ts
      FROM r WHERE rk <= 3 GROUP BY 1 ORDER BY 1""")),

    // transformWithState MapState (completing the state-type trio with
    // e08 ValueState / e10 ListState): per-user per-event-type running
    // totals sub-keyed INSIDE one user's state entry — no composite
    // grouping key, no second shuffle. Single-batch replay emits each
    // (user, type) aggregate once; oracle = the two-key batch group-by.
    QueryDef("e11_map_state", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      val name = "e11_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.Event]
      EventStreams.withShufflePartitions(s, 4) {
        EventStreams.perTypeTotals(s, stream, name)
      }.select($"user_id", $"event_type", $"n",
          round($"total_value", 2).as("total_value"))
        .orderBy($"user_id", $"event_type")
    }, Some("""
      SELECT user_id, event_type, count(*) AS n,
             round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Forward as-of through the same custom operator (q73 is backward):
    // each purchase matched to the EARLIEST subsequent click of the same
    // user — "what did the buyer do next". DuckDB's ASOF supports both
    // directions, so the oracle is again its native form.
    QueryDef("q76_asof_forward", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_event"), $"user_id", $"ts")
      Relational.asofJoinNative(purchases, clicks, "user_id", "ts", "ts",
          rightPayload = Seq("click_event"), strict = true, forward = true)
        .select($"event_id", $"user_id", $"click_event".as("next_click"))
        .orderBy($"event_id")
    }, Some("""
      SELECT p.event_id, p.user_id, c.event_id AS next_click
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts > p.ts
      ORDER BY p.event_id""")),

    // The rest of SQLite's math-function surface (3.35+: trig, exp/log2,
    // degrees/radians, trunc, pi, atan2 — q37 covers abs/ceil/floor/sqrt/
    // pow/ln/sign/mod). Rounded to 6 places: Spark evaluates via
    // java.lang.Math, DuckDB via C libm — bit-identical is not guaranteed
    // in the last ulp, agreement at 1e-6 is the portable contract.
    QueryDef("q77_math_funcs2", (s, dir) => {
      import s.implicits._
      t(s, dir, "part").filter($"p_partkey" <= 500)
        .select($"p_partkey",
          round(sin($"p_retailprice" / 100), 6).as("sn"),
          round(cos($"p_retailprice" / 100), 6).as("cs"),
          round(atan2($"p_size".cast(DoubleType), lit(3.0)), 6).as("at2"),
          round(exp($"p_size" / 10.0), 6).as("ex"),
          round(log2($"p_retailprice"), 6).as("l2"),
          round(degrees($"p_size" / 10.0), 6).as("dg"),
          round(radians($"p_size".cast(DoubleType)), 6).as("rd"),
          // Spark trunc() is date-only; double→long CAST truncates toward
          // zero, which IS numeric trunc (DuckDB's cast would round, so
          // the oracle keeps its native trunc())
          ($"p_retailprice" / 7).cast(LongType).as("tr"),
          round(lit(math.Pi), 6).as("pi"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey,
             round(sin(p_retailprice / 100), 6) AS sn,
             round(cos(p_retailprice / 100), 6) AS cs,
             round(atan2(CAST(p_size AS DOUBLE), 3.0), 6) AS at2,
             round(exp(p_size / 10.0), 6) AS ex,
             round(log2(p_retailprice), 6) AS l2,
             round(degrees(p_size / 10.0), 6) AS dg,
             round(radians(CAST(p_size AS DOUBLE)), 6) AS rd,
             CAST(trunc(p_retailprice / 7) AS BIGINT) AS tr,
             round(pi(), 6) AS pi
      FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""")),

    // GLOB pattern matrix: every translation shape (exact, prefix,
    // suffix, contains, ?, ranges, multi-member sets, and the sqlite3.c
    // edge rules — empty set, unclosed '[', inverted range) evaluated
    // over real strings. Oracle = DuckDB's native GLOB, which agrees
    // with SQLite on all of these ([^...] negation is the one
    // divergence between the two engines, so it stays pinned by the
    // golden SQLiteExprsSpec tests and scripts/sqlite_fidelity.py
    // replays this whole matrix against real SQLite).
    QueryDef("q79_glob_matrix", (s, dir) => {
      import s.implicits._
      val pats = Seq("RUS*", "*IA", "*AN*", "CHINA", "?????", "C?INA",
        "[A-C]*", "*[AI]", "IND[IO]*", "[]*", "A[x", "[z-a]*")
      val base = t(s, dir, "nation").select($"n_name".as("s"))
        .unionByName(Seq("A[x").toDF("s"))
      pats.map(p => base.select(lit(p).as("p"), $"s",
          SQLiteExprs.glob($"s", p).as("m")))
        .reduce(_ unionByName _)
        .orderBy($"p", $"s")
    }, Some("""
      WITH s AS (SELECT n_name AS s FROM nation UNION ALL SELECT 'A[x'),
      p(p) AS (VALUES ('RUS*'), ('*IA'), ('*AN*'), ('CHINA'), ('?????'),
        ('C?INA'), ('[A-C]*'), ('*[AI]'), ('IND[IO]*'), ('[]*'), ('A[x'),
        ('[z-a]*'))
      SELECT p, s, s GLOB p AS m FROM p CROSS JOIN s ORDER BY p, s""")),

    // Language-aware quality scoring (TextOps.qualityScoreByLang): each
    // document scored against ITS language's function-word profile —
    // t02's English-list score penalizes every non-English document; the
    // per-language delta column shows exactly where the corpus-wide
    // filter and the language-aware one disagree. Oracle regenerates the
    // formula per profile from the same word lists.
    QueryDef("t09_quality_by_lang", (s, dir) => {
      import s.implicits._
      // sort-before-compute (see t02/c01): both scorers run once,
      // post-shuffle, instead of once for the range sample and again
      // for the output
      t(s, dir, "documents")
        .select($"doc_id", $"lang", $"text").orderBy($"doc_id")
        .select($"doc_id", $"lang",
          TextOps.qualityScoreByLang($"text", $"lang").as("q_lang"),
          TextOps.qualityScore($"text").as("q_en"))
        .withColumn("delta", round($"q_lang" - $"q_en", 4))
    }, Some {
      val cases = TextOps.LangProfiles.map { case (l, ws) =>
        s"WHEN lang = '$l' THEN ${Core6Sql.quality(ws)}"
      }.mkString("\n             ")
      s"""
      SELECT doc_id, lang,
             CASE $cases
                  ELSE ${Core6Sql.quality(TextOps.Stopwords)} END AS q_lang,
             ${Core6Sql.quality(TextOps.Stopwords)} AS q_en,
             round(CASE $cases
                  ELSE ${Core6Sql.quality(TextOps.Stopwords)} END
               - ${Core6Sql.quality(TextOps.Stopwords)}, 4) AS delta
      FROM documents ORDER BY doc_id"""
    }),

    // SQLite window functions accept a FILTER clause (q05 covers FILTER
    // on plain aggregates); Spark's Window API has no FILTER — the
    // lowering is conditional aggregation over the same frame:
    // f(x) FILTER (WHERE c) OVER w  ≡  f(CASE WHEN c THEN x END) OVER w.
    // Running per-user purchase totals and counts alongside ALL events.
    QueryDef("q78_window_filter", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events").filter($"event_id" < 3000)
        .select($"event_id", $"user_id", $"ts", $"event_type", $"value")
        .withColumn("run_purch_n",
          count(when($"event_type" === "purchase", lit(1))).over(w))
        .withColumn("run_purch_val",
          round(coalesce(sum(when($"event_type" === "purchase", $"value"))
            .over(w), lit(0.0)), 2))
        .select($"event_id", $"user_id", $"run_purch_n", $"run_purch_val")
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id, user_id,
             count(*) FILTER (WHERE event_type = 'purchase') OVER w AS run_purch_n,
             round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase') OVER w, 0.0), 2)
               AS run_purch_val
      FROM events WHERE event_id < 3000
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    // transformWithState EVENT-TIME TIMERS (the feature e08/e10/e11 don't
    // touch): gap-sessionization where an idle session can only be closed
    // by a registered timer firing once the watermark passes lastSeen+gap.
    // Emitted sessions = those closed by a later in-batch event (any
    // user's non-last session) plus last sessions whose timer fired under
    // the final watermark; the oracle reproduces exactly that emission
    // rule, in Spark's millisecond watermark arithmetic.
    QueryDef("e12_timer_sessions", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      val name = "e12_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
        .withWatermark("ts", "1 hour")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[EventStreams.Event]
      EventStreams.withShufflePartitions(s, 4) {
        EventStreams.timerSessions(s, stream, name, gapSec = 1800)
      }.select($"user_id", $"session_start_us", $"n_events", $"duration_us")
        .orderBy($"user_id", $"session_start_us")
    }, Some("""
      WITH a AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
      b AS (SELECT user_id, us, event_id,
              CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                     OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_sess FROM a),
      c AS (SELECT user_id, us, CAST(sum(new_sess) OVER (PARTITION BY user_id
              ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sess FROM b),
      sess AS (SELECT user_id, sess, min(us) AS start_us, max(us) AS last_us,
              count(*) AS n FROM c GROUP BY 1, 2),
      m AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
      r AS (SELECT user_id, sess, start_us, last_us, n,
              row_number() OVER (PARTITION BY user_id ORDER BY sess DESC) AS rk FROM sess)
      SELECT user_id, start_us AS session_start_us, CAST(n AS BIGINT) AS n_events,
             (last_us - start_us) AS duration_us
      FROM r, m
      WHERE rk > 1 OR (last_us // 1000 + 1800000) < (max_us // 1000 - 3600000)
      ORDER BY user_id, session_start_us""")),

    // Streaming MULTIMODAL decode: the documents table replayed as a
    // file-source stream, a REAL WAV payload synthesized and decoded by
    // the real PCM parser INSIDE each micro-batch (a stateless narrow
    // codec stage — how a decode kernel rides a production stream),
    // with a running per-source aggregate in Complete mode. The oracle
    // recomputes every decoded energy closed-form: the streaming
    // execution path must agree with batch math to 4 decimals.
    QueryDef("e13_stream_media", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      val name = "e13_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readDocStream(s, dir)
      val res = EventStreams.withShufflePartitions(s, 4) {
        EventStreams.runToMemory(s, EventStreams.mediaEnergyBySource(stream), name)
      }
      res.select($"source", $"n_docs", $"total_samples", $"total_energy")
        .orderBy($"source")
    }, Some("""
      WITH d AS (SELECT source, doc_id, n_chars % 400 + 16 AS n FROM documents),
      e AS (SELECT source, n,
              list_sum(list_transform(range(0, n),
                i -> pow(((doc_id * 31 + i * 7) % 2001 - 1000) / 32768.0, 2))) AS energy
            FROM d)
      SELECT source, count(*) AS n_docs,
             CAST(sum(n) AS BIGINT) AS total_samples,
             round(sum(energy), 4) AS total_energy
      FROM e GROUP BY source ORDER BY source""")),

    // Stream-stream LEFT OUTER interval join (e04 is the inner form):
    // every click resolved to its following-hour purchase count — zero
    // included, which only an outer join can state. Unmatched clicks are
    // held in join state until the watermark proves no match can arrive,
    // so the query restricts to the watermark-complete region (clicks
    // whose whole match window is safely behind the final watermark);
    // the oracle applies the identical cutoff to the batch left join.
    QueryDef("e09_stream_outer_join", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      import org.apache.spark.sql.streaming.OutputMode
      val name = "e09_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
      val joined = EventStreams.clickFollowedByPurchase(stream, windowSec = 3600)
      val mat = EventStreams.withShufflePartitions(s, 4) {
        EventStreams.runToMemory(s, joined, name, OutputMode.Append())
      }
      val cutoff = broadcast(t(s, dir, "events")
        .agg((max($"ts") - expr("INTERVAL 4 HOURS")).as("cutoff")))
      mat.crossJoin(cutoff).filter($"c_ts" <= $"cutoff")
        .groupBy($"click_id", $"user_id")
        .agg(count($"purchase_id").as("n_purchases"))
        .orderBy($"click_id")
    }, Some("""
      WITH c AS (SELECT event_id AS click_id, user_id, ts AS c_ts
            FROM events WHERE event_type = 'click'),
      p AS (SELECT user_id AS p_user, ts AS p_ts, event_id AS purchase_id
            FROM events WHERE event_type = 'purchase'),
      m AS (SELECT max(ts) - INTERVAL 4 HOURS AS cutoff FROM events)
      SELECT click_id, user_id, count(purchase_id) AS n_purchases
      FROM c CROSS JOIN m
      LEFT JOIN p ON c.user_id = p.p_user AND p.p_ts > c.c_ts
                 AND p.p_ts <= c.c_ts + INTERVAL 3600 SECONDS
      WHERE c.c_ts <= cutoff
      GROUP BY 1, 2 ORDER BY 1""")),

    // S3 prepared-statement scan (SDF.swift:346-397): a parameterized
    // statement bound positionally and read like any S2 scan — the
    // placeholder `?` inside the LIKE string literal is NOT a parameter
    // (quote-state tracking, like sqlite3_prepare's tokenizer). Binds
    // exercise the reference's bind classes: int64, double, text with
    // an embedded quote, and a NULL (which, per SQL three-valued logic,
    // the IS NULL arm has to catch — bound NULLs never equal anything).
    QueryDef("q80_prepared", (s, dir) => {
      graft.Tables.registerAll(s, dir)
      graft.sources.SQLiteIO.preparedScan(s,
        """SELECT c_custkey, c_name, c_acctbal
           FROM customer
           WHERE c_acctbal > ? AND c_mktsegment <> ?
             AND c_name NOT LIKE '%?%'
             AND (c_nationkey = ? OR ? IS NULL)
           ORDER BY c_custkey LIMIT ?""",
        Seq(9000.0, "it's", null, null, 50L))
    }, Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_acctbal > 9000.0 AND c_mktsegment <> 'it''s'
        AND c_name NOT LIKE '%?%'
        AND (c_nationkey = NULL OR NULL IS NULL)
      ORDER BY c_custkey LIMIT 50"""))
  )
}
