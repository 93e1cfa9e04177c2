package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.SQLiteExprs

/** Round-3 additions: a TPC-H Q5-shaped headline join, the generator
  * (UDTF) surface, SQLite date-modifier chains, and TTL'd streaming
  * dedup — each under the DuckDB oracle gate. */
object Core3 {
  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // Headline 6-table join (TPC-H Q5 shape): two broadcast dims pruned
    // before the fact-fact shuffles; the date filter pushes to the orders
    // scan. The plan to want at 100 TB: lineitem⋈orders⋈customer sort-
    // merge/shuffled-hash on the big keys, region+nation broadcast, AQE
    // free to re-plan the supplier side from runtime stats.
    QueryDef("q54_tpch_q5", (s, dir) => {
      import s.implicits._
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1997-01-01"))
      val lineitem = t(s, dir, "lineitem")
      val supplier = t(s, dir, "supplier")
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region").filter($"r_name" === "ASIA")
      customer
        .join(orders, $"c_custkey" === $"o_custkey")
        .join(lineitem, $"l_orderkey" === $"o_orderkey")
        .join(supplier, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }, Some("""
      SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // Generator/UDTF surface (SURVEY §2.9 reserve): posexplode is the
    // built-in Generator — one narrow stage, no shuffle until the sort.
    QueryDef("q55_posexplode_words", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter($"doc_id" <= 20)
        .select($"doc_id",
          split(trim(regexp_replace(lower($"text"), "[^a-z]+", " ")), " ").as("ws"))
        .select($"doc_id", posexplode($"ws").as(Seq("pos0", "word")))
        .filter($"word" =!= "")
        .select($"doc_id", ($"pos0" + 1).cast(LongType).as("pos"), $"word")
        .orderBy($"doc_id", $"pos")
    }, Some("""
      SELECT doc_id, pos, word FROM (
        SELECT doc_id, unnest(ws) AS word, unnest(range(1, len(ws)+1)) AS pos FROM (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')), ' ') AS ws
          FROM documents WHERE doc_id <= 20) x)
      WHERE word <> ''
      ORDER BY doc_id, pos""")),

    // SQLite datetime() modifier chains (sqlite.org/lang_datefunc.html),
    // decoded by SQLiteExprs.dateModifiers into codegen'd built-ins.
    QueryDef("q56_date_modifiers", (s, dir) => {
      import s.implicits._
      def f(c: org.apache.spark.sql.Column) = date_format(c, "yyyy-MM-dd HH:mm:ss")
      t(s, dir, "events")
        .filter($"event_id" <= 50)
        .select($"event_id",
          f(SQLiteExprs.dateModifiers($"ts", "start of month", "+1 month", "-1 day"))
            .as("month_end"),
          f(SQLiteExprs.dateModifiers($"ts", "weekday 1")).as("next_monday"),
          f(SQLiteExprs.dateModifiers($"ts", "start of year", "+9 hours"))
            .as("year_start_9am"),
          // direct +1 month on the raw ts exercises SQLite's NORMALIZE
          // semantics (day-of-month kept, overflow spills into the next
          // month) — the oracle rebuilds it from first-of-month + day
          // arithmetic since DuckDB's own INTERVAL clamps
          f(SQLiteExprs.dateModifiers($"ts", "+1 month")).as("month_plus"))
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id,
             strftime(date_trunc('month', ts) + INTERVAL 1 MONTH - INTERVAL 1 DAY,
                      '%Y-%m-%d %H:%M:%S') AS month_end,
             strftime(ts + to_days(CAST((7 + 1 - dayofweek(ts)) % 7 AS INT)),
                      '%Y-%m-%d %H:%M:%S') AS next_monday,
             strftime(date_trunc('year', ts) + INTERVAL 9 HOUR,
                      '%Y-%m-%d %H:%M:%S') AS year_start_9am,
             strftime(CAST(date_trunc('month', ts) + INTERVAL 1 MONTH AS DATE)
                        + to_days(CAST(day(ts) - 1 AS INT))
                        + (ts - date_trunc('day', ts)),
                      '%Y-%m-%d %H:%M:%S') AS month_plus
      FROM events WHERE event_id <= 50 ORDER BY event_id""")),

    // Batch interval join via time binning (Relational.intervalJoin) —
    // the equi-join scale path for the same semantics the theta form
    // would hand to BroadcastNestedLoopJoin (plan-asserted). Oracle and
    // semantics identical to the streaming twin e04.
    QueryDef("q57_interval_join", (s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id".as("c_user"), $"ts".as("c_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
        .withColumn("w_start", $"p_ts" - expr("INTERVAL 3600 SECONDS"))
      Relational.intervalJoin(clicks, "c_ts", purchases, "w_start", "p_ts",
          key = Some(("c_user", "p_user")), binSeconds = 3600)
        .groupBy($"p_user".as("user_id"))
        .agg(count(lit(1)).as("n_attr"), round(sum($"value"), 2).as("attr_value"))
        .orderBy($"user_id")
    }, Some("""
      SELECT p.user_id, count(*) AS n_attr, round(sum(p.value), 2) AS attr_value
      FROM events p JOIN events c
        ON c.user_id = p.user_id
       AND c.ts >= p.ts - INTERVAL 3600 SECONDS AND c.ts < p.ts
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      GROUP BY 1 ORDER BY 1""")),

    // W4 gap closed by composition: GROUPS frames + EXCLUDE variants
    // (Relational.withGroupsFrameSum). The oracle recomputes through
    // DuckDB's independent dense_rank/RANGE machinery (its GROUPS mode
    // is unimplemented in v1.0.0); exact EXCLUDE semantics are pinned by
    // a hand-computed SurfaceSpec case.
    QueryDef("q58_window_groups", (s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      val li = t(s, dir, "lineitem").filter($"l_orderkey" <= 200)
        .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
          $"l_quantity", $"l_extendedprice")
      val g = Relational.withGroupsFrameSum(li, "l_returnflag", "l_quantity",
        "l_extendedprice", precedingGroups = 2)
      g.select($"l_orderkey", $"l_linenumber",
          round($"g_sum", 2).as("g_sum"),
          round($"g_sum_excl_row", 2).as("g_sum_excl_row"),
          round($"g_sum_excl_group", 2).as("g_sum_excl_group"),
          round($"g_sum_excl_ties", 2).as("g_sum_excl_ties"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      WITH t AS (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_extendedprice,
               dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS dr
        FROM lineitem WHERE l_orderkey <= 200)
      SELECT l_orderkey, l_linenumber,
             round(sum(l_extendedprice) OVER w, 2) AS g_sum,
             round(sum(l_extendedprice) OVER w - l_extendedprice, 2) AS g_sum_excl_row,
             round(sum(l_extendedprice) OVER w - sum(l_extendedprice) OVER peer, 2)
               AS g_sum_excl_group,
             round(sum(l_extendedprice) OVER w - sum(l_extendedprice) OVER peer
                   + l_extendedprice, 2) AS g_sum_excl_ties
      FROM t
      WINDOW w AS (PARTITION BY l_returnflag ORDER BY dr
                   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW),
             peer AS (PARTITION BY l_returnflag, dr)
      ORDER BY l_orderkey, l_linenumber""")),

    // Correlated EXISTS / NOT EXISTS through the SQL-text entry point
    // (SDF.swift:295-304): Catalyst rewrites both to LeftSemi/LeftAnti
    // — the identical SQL runs on both engines.
    QueryDef("q60_exists_sql", (s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        ORDER BY c_custkey""")
    }, Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
      ORDER BY c_custkey""")),

    // SQLite LIKE default case-insensitivity (vs ANSI/Spark LIKE),
    // lowered to ilike on both engines.
    QueryDef("q59_sqlite_like", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey", $"p_name",
          SQLiteExprs.sqliteLike($"p_name", "%GRE%").as("ci_hit"),
          (!SQLiteExprs.sqliteLike($"p_name", "%A%")).as("ci_not_hit"))
        .filter($"ci_hit" || $"ci_not_hit")
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey, p_name,
             p_name ILIKE '%GRE%' AS ci_hit,
             p_name NOT ILIKE '%A%' AS ci_not_hit
      FROM part WHERE (p_name ILIKE '%GRE%') OR (p_name NOT ILIKE '%A%')
      ORDER BY p_partkey""")),

    // Streaming dedup with TTL'd state (dropDuplicatesWithinWatermark):
    // same at-least-once re-delivery simulation as e03, but state entries
    // expire a watermark-delay after first sight instead of tracking the
    // event-time column — the bounded-state contract for high-throughput
    // sources. Must still reduce to exactly the batch table.
    QueryDef("e05_stream_dedup_ttl", (s, dir) => {
      import s.implicits._
      import graft.streaming.EventStreams
      import org.apache.spark.sql.streaming.OutputMode
      val name = "e05_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val stream = EventStreams.readEventStream(s, dir)
      val deduped = EventStreams.dedupEventsWithinWatermark(stream.union(stream))
        .select($"event_id", $"event_type", $"value")
      // first-seen rows emit inside the data batch (TTL eviction is the
      // only thing the trailing trigger advances) — drop it
      EventStreams.withDataBatchesOnly(s) {
        EventStreams.withShufflePartitions(s, 4) {
          EventStreams.runToMemory(s, deduped, name, OutputMode.Append())
        }
      }.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY 1 ORDER BY 1"""))
  )
}
