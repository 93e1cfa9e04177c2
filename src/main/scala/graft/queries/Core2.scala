package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second tranche of the SURVEY §2 relational inventory: remaining window
  * functions (W1/W2/W4), group_concat, OFFSET, LIKE/GLOB, math functions,
  * nested CTEs, IN/NOT IN, VALUES, CUBE. */
object Core2 {
  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q31_window_ntile", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }, Some("""
      SELECT o_orderpriority, o_orderkey,
             CAST(ntile(4) OVER w AS INT) AS quartile,
             round(percent_rank() OVER w, 6) AS pct_rank,
             round(cume_dist() OVER w, 6) AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderpriority, o_orderkey""")),

    QueryDef("q32_window_firstlast", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          first($"o_orderkey").over(w).as("first_key"),
          last($"o_orderkey").over(w).as("last_key"),
          nth_value($"o_orderkey", 2).over(w).as("second_key"))
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
             first_value(o_orderkey) OVER w AS first_key,
             last_value(o_orderkey) OVER w AS last_key,
             nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey""")),

    QueryDef("q33_window_range", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
        .rangeBetween(-10000L, 0L)
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
          count(lit(1)).over(w).as("n_in_band"))
        .select($"o_orderpriority", $"o_orderkey", $"n_in_band")
        .orderBy($"o_orderpriority", $"o_orderkey")
    }, Some("""
      SELECT o_orderpriority, o_orderkey,
             count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
      FROM orders
      ORDER BY o_orderpriority, o_orderkey""")),

    // Same semantics as q33, SCALE plan: difference of two cumulative
    // counts (Relational.rangeBandCount) instead of a sliding RANGE
    // frame — Spark re-aggregates a sliding frame per row (no
    // retraction), O(n × frame); the cumulative rewrite is O(n) —
    // measured 4.3s → 2.8s at sf0.1's ~1k-row bands, and the gap grows
    // linearly with band density. Identical oracle text pins the
    // two plans to the same answer.
    QueryDef("q82_band_count_cum", (s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      Relational.rangeBandCount(
          t(s, dir, "orders")
            .select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
          "o_orderpriority", "o_totalprice", width = 10000.0,
          idCol = "o_orderkey")
        .select($"o_orderpriority", $"o_orderkey", $"n_in_band")
        .orderBy($"o_orderpriority", $"o_orderkey")
    }, Some("""
      SELECT o_orderpriority, o_orderkey,
             count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
      FROM orders
      ORDER BY o_orderpriority, o_orderkey""")),

    // q30's rowid at SCALE: the two-pass partition-offset formulation
    // (Relational.withRowIdScaled) — q30 pins the small-frame global-
    // window form on region; this pins the scale path on the biggest
    // table, where a global window would funnel every row through one
    // sorting task. Same total-order semantics, LongType ids.
    QueryDef("q83_rowid_scaled", (s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      Relational.withRowIdScaled(
          t(s, dir, "lineitem").select($"l_orderkey", $"l_linenumber"),
          Seq($"l_orderkey", $"l_linenumber"))
        .orderBy($"rowid")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rowid
      FROM lineitem ORDER BY rowid""")),

    // Sketch tier for 100 TB profiling — HLL++ distinct counts:
    // approx_count_distinct is Spark's codegen'd HyperLogLog++, carried
    // as mergeable per-partition register state through a map-side-
    // combined partial agg (the exact count(DISTINCT) next to it needs
    // a full shuffle of the distinct values — at scale only the sketch
    // survives; here both run so the sketch is CHECKED). HLL++ is fully
    // deterministic (fixed hash, register-max merge is order-
    // independent), so the within-5σ flag (rsd = 5%) is a stable
    // oracle row, same pattern as the LSH metric-row oracles.
    QueryDef("q84_sketch_distinct", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("exact_distinct"),
          approx_count_distinct($"l_partkey", 0.05).as("approx"))
        .select($"l_returnflag", $"exact_distinct",
          ($"approx" >= $"exact_distinct" * 0.75 &&
            $"approx" <= $"exact_distinct" * 1.25).as("within_bound"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct,
             true AS within_bound
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Sketch tier — mergeable quantiles: percentile_approx (Greenwald-
    // Khanna-style summaries, partial+final merge, one pass over the
    // fact table). The check is the GK rank-error CONTRACT itself:
    // the sketch's p-quantile answer must sit within n/accuracy ranks
    // of p·n, measured by broadcasting the 3-row sketch output against
    // the fact table and counting rows ≤ each answer — the 100 TB shape
    // (tiny side broadcast, fact table never shuffles). Tolerance 2×
    // the contract absorbs tie/floor effects at the small SFs.
    QueryDef("q85_sketch_quantiles", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders").select($"o_totalprice")
      val sk = o.agg(
          percentile_approx($"o_totalprice",
            array(lit(0.25), lit(0.5), lit(0.75)), lit(1000)).as("qv"),
          count(lit(1)).as("n"))
        .select(posexplode($"qv").as(Seq("i", "v")), $"n")
        .withColumn("p",
          element_at(array(lit(0.25), lit(0.5), lit(0.75)), $"i".cast("int") + 1))
      broadcast(sk).join(o, $"o_totalprice" <= $"v", "left")
        .groupBy($"p", $"n").agg(count($"o_totalprice").as("rank"))
        .select($"p", $"n",
          (abs($"rank" - $"p" * $"n") <= $"n" / 500.0 + 1).as("within_bound"))
        .orderBy($"p")
    }, Some("""
      SELECT CAST(q.p AS DOUBLE) AS p,
             (SELECT count(*) FROM orders) AS n,
             true AS within_bound
      FROM (VALUES (0.25), (0.5), (0.75)) q(p) ORDER BY p""")),

    // One-pass column profiler (Scale.tableProfile), benched as the
    // PRODUCTION shape: null counts and min/max for six lineitem
    // columns in a SINGLE aggregate over one scan, melted to a row per
    // column (the HLL++ distinct sketch the operator also carries is
    // benched by q84 and verified by q86_profile_gate below — its
    // six-way exact-distinct companion would dominate this row's time,
    // the same gate-vs-operator split the d02/d06 rows follow).
    // Columns restricted to longs/strings so min/max render identically
    // across engines.
    QueryDef("q86_table_profile", (s, dir) => {
      import s.implicits._
      import graft.operators.Scale
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_returnflag", "l_linestatus")
      // r17: withApprox = false — this row's declared output carries only
      // nulls/min/max, and the stack() melt kept the six discarded HLL++
      // sketches alive in the aggregate (Catalyst can't prune through the
      // melt; 1.03 → 0.76 s at sf0.1, clean 5-rep median). The sketch tier keeps its own
      // bench (q84) and its bound keeps its gate (q86_profile_gate, which
      // still runs the full withExact profile).
      Scale.tableProfile(t(s, dir, "lineitem"), cols, withApprox = false)
        .select($"column_name", $"n_null", $"min_value", $"max_value")
        .orderBy($"column_name")
    }, Some("""
      SELECT * FROM (
        SELECT 'l_orderkey' AS column_name,
               count(*) - count(l_orderkey) AS n_null,
               CAST(min(l_orderkey) AS VARCHAR) AS min_value,
               CAST(max(l_orderkey) AS VARCHAR) AS max_value FROM lineitem
        UNION ALL SELECT 'l_partkey', count(*) - count(l_partkey),
               CAST(min(l_partkey) AS VARCHAR), CAST(max(l_partkey) AS VARCHAR)
               FROM lineitem
        UNION ALL SELECT 'l_suppkey', count(*) - count(l_suppkey),
               CAST(min(l_suppkey) AS VARCHAR), CAST(max(l_suppkey) AS VARCHAR)
               FROM lineitem
        UNION ALL SELECT 'l_linenumber', count(*) - count(l_linenumber),
               CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
               FROM lineitem
        UNION ALL SELECT 'l_returnflag', count(*) - count(l_returnflag),
               min(l_returnflag), max(l_returnflag) FROM lineitem
        UNION ALL SELECT 'l_linestatus', count(*) - count(l_linestatus),
               min(l_linestatus), max(l_linestatus) FROM lineitem)
      ORDER BY column_name""")),

    // q86's sketch gate (CORRECTNESS-only, Bench skips `*_gate`): the
    // full profile with exact distincts — the oracle hash-matches the
    // exact fields and bounds the HLL++ sketch (same 5σ flag as q84).
    QueryDef("q86_profile_gate", (s, dir) => {
      import s.implicits._
      import graft.operators.Scale
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_returnflag", "l_linestatus")
      Scale.tableProfile(t(s, dir, "lineitem"), cols, withExact = true)
        .select($"column_name", $"n_null", $"exact_distinct",
          $"min_value", $"max_value",
          ($"approx_distinct" >= $"exact_distinct" * 0.75 &&
            $"approx_distinct" <= $"exact_distinct" * 1.25).as("within_bound"))
        .orderBy($"column_name")
    }, Some("""
      SELECT * FROM (
        SELECT 'l_orderkey' AS column_name,
               count(*) - count(l_orderkey) AS n_null,
               count(DISTINCT l_orderkey) AS exact_distinct,
               CAST(min(l_orderkey) AS VARCHAR) AS min_value,
               CAST(max(l_orderkey) AS VARCHAR) AS max_value,
               true AS within_bound FROM lineitem
        UNION ALL SELECT 'l_partkey', count(*) - count(l_partkey),
               count(DISTINCT l_partkey), CAST(min(l_partkey) AS VARCHAR),
               CAST(max(l_partkey) AS VARCHAR), true FROM lineitem
        UNION ALL SELECT 'l_suppkey', count(*) - count(l_suppkey),
               count(DISTINCT l_suppkey), CAST(min(l_suppkey) AS VARCHAR),
               CAST(max(l_suppkey) AS VARCHAR), true FROM lineitem
        UNION ALL SELECT 'l_linenumber', count(*) - count(l_linenumber),
               count(DISTINCT l_linenumber), CAST(min(l_linenumber) AS VARCHAR),
               CAST(max(l_linenumber) AS VARCHAR), true FROM lineitem
        UNION ALL SELECT 'l_returnflag', count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag), min(l_returnflag),
               max(l_returnflag), true FROM lineitem
        UNION ALL SELECT 'l_linestatus', count(*) - count(l_linestatus),
               count(DISTINCT l_linestatus), min(l_linestatus),
               max(l_linestatus), true FROM lineitem)
      ORDER BY column_name""")),

    QueryDef("q34_group_concat", (s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(array_join(array_sort(collect_list($"n_name")), ",").as("nations"),
             count(lit(1)).as("n"))
        .orderBy($"r_name")
    }, Some("""
      SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    QueryDef("q35_offset", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey", round($"o_totalprice", 2).as("o_totalprice"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(100).limit(50)
    }, Some("""
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 50 OFFSET 100""")),

    QueryDef("q36_like_glob", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey", $"p_name", $"p_brand",
          $"p_name".like("%gre%").as("like_hit"),
          // SQLite GLOB 'Brand#1*' — prefix shape compiles to StartsWith
          graft.functions.SQLiteExprs.glob($"p_brand", "Brand#1*").as("glob_hit"),
          $"p_name".like("_i%").as("underscore_hit"))
        .filter($"like_hit" || $"glob_hit" || $"underscore_hit")
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey, p_name, p_brand,
             p_name LIKE '%gre%' AS like_hit,
             regexp_matches(p_brand, '^Brand#1.*$') AS glob_hit,
             p_name LIKE '_i%' AS underscore_hit
      FROM part
      WHERE p_name LIKE '%gre%' OR regexp_matches(p_brand, '^Brand#1.*$')
            OR p_name LIKE '_i%'
      ORDER BY p_partkey""")),

    QueryDef("q37_math_funcs", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").filter($"l_orderkey" <= 1000)
        .select($"l_orderkey", $"l_linenumber",
          abs($"l_discount" - 0.05).as("a"),
          ceil($"l_extendedprice" / 1000).cast("long").as("c"),
          floor($"l_extendedprice" / 1000).cast("long").as("f"),
          round(sqrt($"l_quantity"), 6).as("sq"),
          round(pow($"l_quantity", 2), 2).as("p2"),
          round(log($"l_extendedprice"), 6).as("lg"),
          signum($"l_discount" - 0.05).cast("int").as("sg"),
          ($"l_orderkey" % 7).as("md"))
        .withColumn("a", round($"a", 6))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             round(abs(l_discount - 0.05), 6) AS a,
             CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS c,
             CAST(floor(l_extendedprice / 1000) AS BIGINT) AS f,
             round(sqrt(l_quantity), 6) AS sq,
             round(pow(l_quantity, 2), 2) AS p2,
             round(ln(l_extendedprice), 6) AS lg,
             CAST(sign(l_discount - 0.05) AS INT) AS sg,
             l_orderkey % 7 AS md
      FROM lineitem WHERE l_orderkey <= 1000
      ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q38_nested_cte", (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      val nat = t(s, dir, "nation")
      val supRev = li.groupBy($"l_suppkey")
        .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      val natRev = supRev.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name").agg(round(sum($"rev"), 2).as("nation_rev"))
      val w = Window.orderBy($"nation_rev".desc, $"n_name")
      natRev.withColumn("rnk", rank().over(w)).orderBy($"rnk", $"n_name")
    }, Some("""
      WITH sup_rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS rev
        FROM lineitem GROUP BY l_suppkey),
      nat_rev AS (
        SELECT n_name, round(sum(rev), 2) AS nation_rev
        FROM sup_rev JOIN supplier ON l_suppkey = s_suppkey
                     JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name)
      SELECT n_name, nation_rev,
             CAST(rank() OVER (ORDER BY nation_rev DESC, n_name) AS INT) AS rnk
      FROM nat_rev ORDER BY rnk, n_name""")),

    QueryDef("q39_in_notin", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val hotCust = t(s, dir, "customer").filter($"c_acctbal" > 9500)
        .select($"c_custkey")
      o.filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .join(hotCust, $"o_custkey" === $"c_custkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q40_values_inline", (s, dir) => {
      import s.implicits._
      val weights = s.createDataFrame(Seq(
        ("1-URGENT", 5.0), ("2-HIGH", 4.0), ("3-MEDIUM", 3.0),
        ("4-NOT SPECIFIED", 2.0), ("5-LOW", 1.0)))
        .toDF("prio", "weight")
      t(s, dir, "orders")
        .join(broadcast(weights), $"o_orderpriority" === $"prio")
        .groupBy($"prio")
        .agg(round(sum($"o_totalprice" * $"weight"), 2).as("weighted_rev"))
        .orderBy($"prio")
    }, Some("""
      SELECT prio, round(sum(o_totalprice * weight), 2) AS weighted_rev
      FROM orders
      JOIN (VALUES ('1-URGENT', 5.0), ('2-HIGH', 4.0), ('3-MEDIUM', 3.0),
                   ('4-NOT SPECIFIED', 2.0), ('5-LOW', 1.0)) AS v(prio, weight)
        ON o_orderpriority = prio
      GROUP BY prio ORDER BY prio""")),

    QueryDef("q42_strftime", (s, dir) => {
      import s.implicits._
      // SQLite strftime/date/time/datetime surface via date_format
      t(s, dir, "orders")
        .select($"o_orderkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("d"),
          date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("dt"),
          date_format($"o_orderdate", "yyyy").as("y4"),
          date_format($"o_orderdate", "D").cast("int").as("doy"),
          dayofweek($"o_orderdate").as("dow"))
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS d,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dt,
             strftime(o_orderdate, '%Y') AS y4,
             CAST(CAST(strftime(o_orderdate, '%j') AS INT) AS INT) AS doy,
             CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
      FROM orders ORDER BY o_orderkey""")),

    QueryDef("q43_printf", (s, dir) => {
      import s.implicits._
      // SQLite printf/format -> format_string
      t(s, dir, "supplier")
        .select($"s_suppkey",
          format_string("supplier %d has balance %.2f", $"s_suppkey", $"s_acctbal").as("msg"),
          format_string("%05d", $"s_suppkey").as("padded"),
          format_string("%s/%s", $"s_name", $"s_nationkey").as("path"))
        .orderBy($"s_suppkey")
    }, Some("""
      SELECT s_suppkey,
             printf('supplier %d has balance %.2f', s_suppkey, s_acctbal) AS msg,
             printf('%05d', s_suppkey) AS padded,
             printf('%s/%s', s_name, CAST(s_nationkey AS VARCHAR)) AS path
      FROM supplier ORDER BY s_suppkey""")),

    QueryDef("q44_asof_join", (s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id".as("click_event"), $"user_id", $"ts")
      Relational.asofJoin(purchases, clicks, "user_id", "ts", "ts",
          rightPayload = Seq("click_event"), asofCol = "m", strict = true)
        .select($"event_id", $"user_id", $"m.click_event".as("click_id"))
        .orderBy($"event_id")
    }, Some("""
      SELECT p.event_id, p.user_id, c.event_id AS click_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts > c.ts
      ORDER BY p.event_id""")),

    QueryDef("q45_salted_join", (s, dir) => {
      import s.implicits._
      import graft.operators.Scale
      // skew-salted join must be semantically invisible: oracle is the
      // PLAIN join aggregation
      val big = t(s, dir, "lineitem").select($"l_orderkey".as("k"), $"l_quantity")
      val small = t(s, dir, "orders").select($"o_orderkey".as("k"), $"o_orderpriority")
      Scale.saltedJoinBy(big, small, "k", $"l_quantity", salt = 8)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .orderBy($"o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q47_stats_agg", (s, dir) => {
      import s.implicits._
      // statistical aggregates (beyond the reference's SQLite surface —
      // additive, exact-definition functions shared with DuckDB)
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(stddev_samp($"l_extendedprice"), 2).as("sd_price"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qp"),
          round(covar_samp($"l_quantity", $"l_discount"), 6).as("cov_qd"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
             round(stddev_samp(l_extendedprice), 2) AS sd_price,
             round(var_samp(l_quantity), 4) AS var_qty,
             round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
             round(covar_samp(l_quantity, l_discount), 6) AS cov_qd
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q48_string_funcs2", (s, dir) => {
      import s.implicits._
      // trim family + padding + part extraction (SQLite: ltrim/rtrim/
      // trim/substr; padding via printf — here the direct functions)
      t(s, dir, "part").filter($"p_partkey" <= 500)
        .select($"p_partkey",
          ltrim(concat(lit("  "), $"p_brand")).as("lt"),
          rtrim(concat($"p_brand", lit("  "))).as("rt"),
          lpad($"p_partkey".cast("string"), 8, "0").as("lp"),
          rpad($"p_brand", 12, ".").as("rp"),
          reverse($"p_brand").as("rev"),
          repeat(lit("ab"), 3).as("rep"),
          split($"p_type", " ").getItem(0).as("first_word"),
          element_at(split($"p_type", " "), -1).as("last_word"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey,
             ltrim('  ' || p_brand) AS lt,
             rtrim(p_brand || '  ') AS rt,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS lp,
             rpad(p_brand, 12, '.') AS rp,
             reverse(p_brand) AS rev,
             repeat('ab', 3) AS rep,
             split_part(p_type, ' ', 1) AS first_word,
             split_part(p_type, ' ', -1) AS last_word
      FROM part WHERE p_partkey <= 500
      ORDER BY p_partkey""")),

    QueryDef("q49_pivot", (s, dir) => {
      import s.implicits._
      // pivot with an explicit value list (deterministic columns); oracle
      // spells the same thing as conditional sums
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum($"l_extendedprice"), 2))
        .withColumnsRenamed(Map("F" -> "rev_f", "O" -> "rev_o"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS rev_f,
             round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS rev_o
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    QueryDef("q50_unpivot", (s, dir) => {
      import s.implicits._
      t(s, dir, "supplier")
        .unpivot(Array($"s_suppkey"), Array($"s_acctbal", $"s_nationkey".cast("double")),
          "metric", "value")
        .select($"s_suppkey", $"metric", round($"value", 2).as("value"))
        .orderBy($"s_suppkey", $"metric")
    }, Some("""
      SELECT s_suppkey, metric, round(value, 2) AS value FROM (
        SELECT s_suppkey, 's_acctbal' AS metric, s_acctbal AS value FROM supplier
        UNION ALL
        SELECT s_suppkey, 's_nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value FROM supplier) u
      ORDER BY s_suppkey, metric""")),

    QueryDef("q51_sql_lateral", (s, dir) => {
      // S2 for real: the arbitrary-SQL entry point (register views, hand
      // SQL text to Catalyst — the reference's DataFrame(connection:
      // statement:) path, SDF.swift:295) with a correlated LATERAL
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS top_price
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        ORDER BY c.c_custkey""")
    }, Some("""
      SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS top_price
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      ORDER BY c.c_custkey""")),

    QueryDef("q46_null_funcs", (s, dir) => {
      import s.implicits._
      // SQLite ifnull/nullif/coalesce/iif surface
      t(s, dir, "lineitem").filter($"l_orderkey" <= 2000)
        .select($"l_orderkey", $"l_linenumber",
          nullif($"l_returnflag", lit("N")).as("rf_or_null"),
          coalesce(nullif($"l_returnflag", lit("N")), lit("(none)")).as("rf_filled"),
          when($"l_quantity" > 25, "bulk").otherwise("small").as("iif_bucket"),
          expr("ifnull(nullif(l_linestatus, 'O'), 'open')").as("ls_filled"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             nullif(l_returnflag, 'N') AS rf_or_null,
             coalesce(nullif(l_returnflag, 'N'), '(none)') AS rf_filled,
             CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS iif_bucket,
             ifnull(nullif(l_linestatus, 'O'), 'open') AS ls_filled
      FROM lineitem WHERE l_orderkey <= 2000
      ORDER BY l_orderkey, l_linenumber""")),

    QueryDef("q41_cube", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
                coalesce($"l_linestatus", lit("ALL")).as("ls"),
                $"n", $"qty")
        .orderBy($"rf", $"ls")
    }, Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY rf, ls""")),

    QueryDef("q52_scalar_minmax_hex", (s, dir) => {
      import s.implicits._
      // SQLite's 2-arg scalar min/max (-> least/greatest), hex(),
      // unicode() (-> ascii) and char() (-> char) surface
      t(s, dir, "part").filter($"p_partkey" < 500)
        .select($"p_partkey",
          least($"p_size".cast("double"), $"p_retailprice").as("lo"),
          greatest($"p_size".cast("double"), $"p_retailprice").as("hi"),
          hex(substring($"p_name", 1, 4)).as("hx"),
          ascii($"p_name").as("uni"),
          expr("char(65 + p_size % 26)").as("ch"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey,
             least(CAST(p_size AS DOUBLE), p_retailprice) AS lo,
             greatest(CAST(p_size AS DOUBLE), p_retailprice) AS hi,
             hex(substr(p_name, 1, 4)) AS hx,
             ascii(p_name) AS uni,
             chr(65 + p_size % 26) AS ch
      FROM part WHERE p_partkey < 500 ORDER BY p_partkey""")),

    QueryDef("q53_total_agg", (s, dir) => {
      import s.implicits._
      // SQLite total(): like sum() but 0.0 (never NULL) over an empty
      // input — shown side-by-side on a predicate that matches no rows
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(coalesce(sum(when($"l_discount" > 0.99, $"l_quantity")), lit(0.0)), 2)
            .as("total_phantom"),
          sum(when($"l_discount" > 0.99, $"l_quantity")).as("sum_phantom"),
          round(coalesce(sum($"l_quantity"), lit(0.0)), 2).as("total_qty"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(coalesce(sum(l_quantity) FILTER (WHERE l_discount > 0.99), 0.0), 2) AS total_phantom,
             sum(l_quantity) FILTER (WHERE l_discount > 0.99) AS sum_phantom,
             round(coalesce(sum(l_quantity), 0.0), 2) AS total_qty
      FROM lineitem GROUP BY 1 ORDER BY 1"""))
  )
}
