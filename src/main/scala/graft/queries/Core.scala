package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Relational

/** One named query per relational operator row of SURVEY.md §2, each with a
  * colocated DuckDB oracle so the Spark plan and the SQL stay in sync.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *  - every computed/aggregate column is aliased IDENTICALLY on both sides
  *  - double aggregates are round()ed (2dp for sums, 4dp for ratios) on
  *    both sides so summation-order ulp drift cannot flip the hash
  *  - every result has a total ORDER BY (unique tie-break key included)
  *  - year()/extract() style functions are cast to the same type both sides
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Core {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // ---- aggregation (§2.4) ------------------------------------------------
    QueryDef("q01_pricing_summary", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")), 2).as("sum_charge"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_extendedprice"), 4).as("avg_price"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q02_scalar_agg", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        round(sum($"l_extendedprice"), 2).as("total_price"),
        round(min($"l_quantity"), 2).as("min_qty"),
        round(max($"l_quantity"), 2).as("max_qty"),
        min($"l_shipdate").cast("date").as("first_ship"),
        max($"l_shipdate").cast("date").as("last_ship"))
    }, Some("""
      SELECT count(*) AS n_rows,
             round(sum(l_extendedprice), 2) AS total_price,
             round(min(l_quantity), 2) AS min_qty,
             round(max(l_quantity), 2) AS max_qty,
             CAST(min(l_shipdate) AS DATE) AS first_ship,
             CAST(max(l_shipdate) AS DATE) AS last_ship
      FROM lineitem""")),

    QueryDef("q03_distinct_agg", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").agg(
        countDistinct($"l_orderkey").as("n_orders"),
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_returnflag").as("n_flags"))
    }, Some("""
      SELECT count(DISTINCT l_orderkey) AS n_orders,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT l_returnflag) AS n_flags
      FROM lineitem""")),

    QueryDef("q04_having", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_suppkey")
        .agg(round(sum($"l_quantity"), 2).as("total_qty"),
             count(lit(1)).as("n_lines"))
        .filter($"total_qty" > 14000.0)
        .orderBy($"l_suppkey")
    }, Some("""
      SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_lines
      FROM lineitem
      GROUP BY l_suppkey
      HAVING round(sum(l_quantity), 2) > 14000.0
      ORDER BY l_suppkey""")),

    QueryDef("q05_agg_filter", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(sum(when($"l_discount" > 0.05, $"l_extendedprice").otherwise(0.0)), 2).as("hi_disc_price"),
          round(sum(when($"l_discount" <= 0.05, $"l_extendedprice").otherwise(0.0)), 2).as("lo_disc_price"),
          count(when($"l_quantity" >= 25, lit(1))).as("n_bulk"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag,
             round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS hi_disc_price,
             round(sum(CASE WHEN l_discount <= 0.05 THEN l_extendedprice ELSE 0.0 END), 2) AS lo_disc_price,
             count(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),

    // ---- joins (§2.3) ------------------------------------------------------
    QueryDef("q06_join_3way", (s, dir) => {
      import s.implicits._
      // fact-fact join shuffles on orderkey; customer is a dim -> broadcast
      val c = broadcast(t(s, dir, "customer"))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy($"c_mktsegment")
    }, Some("""
      SELECT c_mktsegment,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")),

    QueryDef("q07_join_left", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      Relational.leftJoin(c, o, $"c_custkey" === $"o_custkey")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
             round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("spend"))
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS spend
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""")),

    QueryDef("q08_join_full", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val f = o.filter($"o_orderstatus" === "F").groupBy($"o_custkey".as("fk"))
        .agg(count(lit(1)).as("n_f"))
      val p = o.filter($"o_orderstatus" === "O").groupBy($"o_custkey".as("ok"))
        .agg(count(lit(1)).as("n_o"))
      Relational.fullJoin(f, p, $"fk" === $"ok")
        .select(coalesce($"fk", $"ok").as("custkey"),
                coalesce($"n_f", lit(0L)).as("n_f"),
                coalesce($"n_o", lit(0L)).as("n_o"))
        .orderBy($"custkey")
    }, Some("""
      WITH f AS (SELECT o_custkey AS fk, count(*) AS n_f FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
           p AS (SELECT o_custkey AS ok, count(*) AS n_o FROM orders WHERE o_orderstatus = 'O' GROUP BY 1)
      SELECT coalesce(fk, ok) AS custkey,
             coalesce(n_f, 0) AS n_f,
             coalesce(n_o, 0) AS n_o
      FROM f FULL OUTER JOIN p ON fk = ok
      ORDER BY custkey""")),

    QueryDef("q09_join_semi", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter($"l_quantity" >= 49)
      Relational.semiJoin(o, big, $"o_orderkey" === $"l_orderkey")
        .select($"o_orderkey", $"o_orderstatus", round($"o_totalprice", 2).as("o_totalprice"))
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      ORDER BY o_orderkey""")),

    QueryDef("q10_join_anti", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter($"o_totalprice" > 300000.0)
      Relational.antiJoin(c, big, $"c_custkey" === $"o_custkey")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      ORDER BY c_custkey""")),

    QueryDef("q11_join_cross", (s, dir) => {
      import s.implicits._
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      Relational.crossJoin(r, n)
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name")
    }, Some("""
      SELECT r_name, n_name FROM region CROSS JOIN nation
      ORDER BY r_name, n_name""")),

    QueryDef("q12_join_theta", (s, dir) => {
      import s.implicits._
      val sup = t(s, dir, "supplier")
      val cust = t(s, dir, "customer")
      // equi on nationkey + inequality: stays a hash join with a residual
      cust.join(broadcast(sup),
          $"c_nationkey" === $"s_nationkey" && $"c_acctbal" > $"s_acctbal")
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_richer_cust"))
        .orderBy($"s_suppkey")
    }, Some("""
      SELECT s_suppkey, count(*) AS n_richer_cust
      FROM customer JOIN supplier
        ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
      GROUP BY s_suppkey
      ORDER BY s_suppkey""")),

    // ---- window functions (§2.5) ------------------------------------------
    QueryDef("q13_window_rank", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(Window.partitionBy($"o_custkey").orderBy($"o_orderstatus")))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("o_totalprice"), $"rn", $"rk")
        .orderBy($"o_custkey", $"rn")
    }, Some("""
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
             CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rk
        FROM orders) x
      WHERE rn <= 3
      ORDER BY o_custkey, rn""")),

    QueryDef("q14_window_lag", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("next_key", lead($"o_orderkey", 1).over(w))
        .select($"o_custkey", $"o_orderkey",
                round($"o_totalprice" - coalesce($"prev_price", lit(0.0)), 2).as("delta"),
                $"next_key")
        .orderBy($"o_custkey", $"o_orderkey")
    }, Some("""
      SELECT o_custkey, o_orderkey,
             round(o_totalprice - coalesce(lag(o_totalprice, 1) OVER w, 0.0), 2) AS delta,
             lead(o_orderkey, 1) OVER w AS next_key
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey""")),

    QueryDef("q15_window_running", (s, dir) => {
      import s.implicits._
      // the synthetic corpus REUSES (l_orderkey, l_linenumber) — 118k
      // duplicate pairs at sf0.1 — so those two alone are NOT a total
      // order: one suppkey had two rows tied on (shipdate, orderkey,
      // linenumber) with different quantities, and DuckDB resolved the
      // tie differently run-to-run (running_qty flipped 7728/7731).
      // quantity + extendedprice totalize the order; rows identical in
      // all five keys are interchangeable, so the output is order-stable
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // accumulate in DECIMAL so the running sum is exact in both
      // engines (double accumulation drifted one .005 boundary in 600k
      // rows at sf0.1), then surface as the same double column
      t(s, dir, "lineitem")
        .withColumn("running_qty",
          round(sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .over(w).cast("double"), 2))
        .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
        .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
               AS running_qty
      FROM lineitem
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""")),

    // ---- sorts / limits / top-k (§2.6) ------------------------------------
    QueryDef("q16_sort_multi", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderstatus", $"o_orderkey",
                round($"o_totalprice", 2).as("o_totalprice"))
        .orderBy($"o_orderpriority".asc, $"o_totalprice".desc, $"o_orderkey".asc)
        .limit(500)
    }, Some("""
      SELECT o_orderpriority, o_orderstatus, o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      ORDER BY o_orderpriority ASC, round(o_totalprice, 2) DESC, o_orderkey ASC
      LIMIT 500""")),

    QueryDef("q17_topk", (s, dir) => {
      import s.implicits._
      Relational.topK(t(s, dir, "orders"), 25, $"o_totalprice".desc, $"o_orderkey".asc)
        .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"))
    }, Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""")),

    // ---- set ops (§2.7) ----------------------------------------------------
    QueryDef("q18_intersect", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val f = o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
      val p = o.filter($"o_orderstatus" === "O").select($"o_custkey".as("custkey"))
      Relational.intersect(f, p).orderBy($"custkey")
    }, Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY custkey""")),

    QueryDef("q19_except", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").select($"c_custkey".as("custkey"))
      val o = t(s, dir, "orders").filter($"o_orderstatus" === "F")
        .select($"o_custkey".as("custkey"))
      Relational.except(c, o).orderBy($"custkey")
    }, Some("""
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY custkey""")),

    QueryDef("q20_union", (s, dir) => {
      import s.implicits._
      val hi = t(s, dir, "supplier").filter($"s_acctbal" > 5000)
        .select($"s_name".as("name"), lit("supplier").as("side"))
      val lo = t(s, dir, "customer").filter($"c_acctbal" > 9000)
        .select($"c_name".as("name"), lit("customer").as("side"))
      Relational.unionAll(hi, lo).orderBy($"side", $"name")
    }, Some("""
      SELECT s_name AS name, 'supplier' AS side FROM supplier WHERE s_acctbal > 5000
      UNION ALL
      SELECT c_name AS name, 'customer' AS side FROM customer WHERE c_acctbal > 9000
      ORDER BY side, name""")),

    // ---- distinct / expressions / strings (§2.2, §2.8) ---------------------
    QueryDef("q21_distinct", (s, dir) => {
      import s.implicits._
      Relational.distinctRows(
          t(s, dir, "lineitem").select($"l_returnflag", $"l_linestatus"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q22_string_funcs", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          $"p_partkey",
          upper($"p_brand").as("brand_u"),
          lower($"p_type").as("type_l"),
          substring($"p_name", 1, 8).as("name8"),
          length($"p_name").as("name_len"),
          regexp_replace($"p_type", " ", "_").as("type_us"),
          instr($"p_type", "BRUSHED").as("brushed_at"),
          concat($"p_brand", lit("/"), $"p_type").as("brand_type"),
          when($"p_name".like("%green%"), 1).otherwise(0).as("is_green"))
        .orderBy($"p_partkey")
    }, Some("""
      SELECT p_partkey,
             upper(p_brand) AS brand_u,
             lower(p_type) AS type_l,
             substr(p_name, 1, 8) AS name8,
             CAST(length(p_name) AS INT) AS name_len,
             replace(p_type, ' ', '_') AS type_us,
             CAST(instr(p_type, 'BRUSHED') AS INT) AS brushed_at,
             p_brand || '/' || p_type AS brand_type,
             CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green
      FROM part ORDER BY p_partkey""")),

    QueryDef("q23_case_cast", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(
          when($"o_totalprice" < 50000, "small")
            .when($"o_totalprice" < 150000, "medium")
            .otherwise("large").as("bucket"),
          floor($"o_totalprice" / 1000).cast("long").as("k_price"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), max($"k_price").as("max_k"))
        .orderBy($"bucket")
    }, Some("""
      SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 150000 THEN 'medium'
                  ELSE 'large' END AS bucket,
             count(*) AS n,
             max(CAST(floor(o_totalprice / 1000) AS BIGINT)) AS max_k
      FROM orders
      GROUP BY 1 ORDER BY bucket""")),

    // ---- subqueries / CTEs / rollup ---------------------------------------
    QueryDef("q24_subquery_avg", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val avgP = o.agg(avg($"o_totalprice").as("avg_price"))
      o.crossJoin(broadcast(avgP))
        .filter($"o_totalprice" > $"avg_price")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_above"))
        .orderBy($"o_orderpriority")
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_above
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")),

    QueryDef("q25_rollup", (s, dir) => {
      import s.implicits._
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val c = t(s, dir, "customer")
      c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("bal"))
        .select(coalesce($"r_name", lit("ALL")).as("region"),
                coalesce($"n_name", lit("ALL")).as("nation"),
                $"n_cust", $"bal")
        .orderBy($"region", $"nation")
    }, Some("""
      SELECT coalesce(r_name, 'ALL') AS region,
             coalesce(n_name, 'ALL') AS nation,
             count(*) AS n_cust,
             round(sum(c_acctbal), 2) AS bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)
      ORDER BY region, nation""")),

    // ---- date/time + json (§2.8) ------------------------------------------
    QueryDef("q26_date_parts", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(year($"o_orderdate").as("yr"), month($"o_orderdate").as("mo"))
        .agg(count(lit(1)).as("n_orders"),
             round(sum($"o_totalprice"), 2).as("revenue"))
        .orderBy($"yr", $"mo")
    }, Some("""
      SELECT CAST(extract(year FROM o_orderdate) AS INT) AS yr,
             CAST(extract(month FROM o_orderdate) AS INT) AS mo,
             count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1, 2 ORDER BY yr, mo""")),

    QueryDef("q27_json_extract", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(get_json_object($"props", "$.k").cast("int").as("k"), $"event_type")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
             round(avg($"k"), 4).as("avg_k"),
             max($"k").as("max_k"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type, count(*) AS n,
             round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
             max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""")),

    QueryDef("q28_time_window", (s, dir) => {
      import s.implicits._
      // tumbling 1h window: same result as date_trunc since windows align.
      // Output the window start as epoch seconds (bigint) — integer
      // compare is immune to parquet timestamp-encoding differences
      // between engines (INT96 vs µs).
      t(s, dir, "events")
        .groupBy(unix_seconds(window($"ts", "1 hour").getField("start")).as("hour_start"),
                 $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
        .orderBy($"hour_start", $"event_type")
    }, Some("""
      SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start, event_type,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""")),

    QueryDef("q29_sessionize", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1).otherwise(0))
        .groupBy($"user_id")
        .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events FROM (
        SELECT user_id,
               CASE WHEN lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events) x
      GROUP BY user_id ORDER BY user_id""")),

    QueryDef("q30_rowid", (s, dir) => {
      import s.implicits._
      Relational.withRowId(t(s, dir, "region").select($"r_regionkey", $"r_name"),
          Seq($"r_regionkey"))
        .orderBy($"rowid")
    }, Some("""
      SELECT r_regionkey, r_name,
             CAST(row_number() OVER (ORDER BY r_regionkey) AS BIGINT) AS rowid
      FROM region ORDER BY rowid"""))
  )
}
