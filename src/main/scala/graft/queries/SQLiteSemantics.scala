package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.SQLiteExprs

/** Driver-checkable queries for the reference's LIB-layer semantics
  * (SURVEY.md §2.8 C1–C5): each builds SQLite-shaped cells from the test
  * corpus, decodes them with our expressions, and the DuckDB oracle
  * recomputes the expected value from the source column directly — so a
  * hash match proves the decode against ground truth. */
object SQLiteSemantics {
  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  val defs: Seq[QueryDef] = Seq(

    // C4: all three SQLite date representations decode to the source instant
    QueryDef("c01_date_tri", (s, dir) => {
      import s.implicits._
      // Sort BEFORE the encode/parse chain: a global orderBy placed after
      // it makes the range-partitioner's sampling pass re-run every
      // date_format/parse for the sample, then the shuffle drags the wide
      // encoded strings — sorting the narrow scan first and projecting
      // after keeps the output ordering (no exchange follows) and runs the
      // parse once, post-shuffle. A/B at sf0.1: 5.0 → 1.2 s, identical
      // rows AND order.
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
        .orderBy($"l_orderkey", $"l_linenumber")
      // parquet TIMESTAMP(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ,
      // which has no direct numeric cast — hop through session-TZ (UTC) first
      val epoch = $"l_shipdate".cast(TimestampType).cast(LongType)
      li.select(
          $"l_orderkey", $"l_linenumber",
          // build the three cell encodings the reference accepts
          date_format($"l_shipdate", "yyyy-MM-dd HH:mm:ss").as("txt_cell"),
          epoch.cast(StringType).as("int_cell"),
          (epoch.cast(DoubleType) / SQLiteExprs.SecondsPerDay + SQLiteExprs.JulianUnixEpoch)
            .cast(StringType).as("jul_cell"))
        .select(
          $"l_orderkey", $"l_linenumber",
          SQLiteExprs.dateTriFromString($"txt_cell").cast(LongType).as("e_text"),
          SQLiteExprs.dateTriFromString($"int_cell").cast(LongType).as("e_int"),
          round(SQLiteExprs.dateTriFromString($"jul_cell").cast(DoubleType)).cast(LongType).as("e_julian"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(epoch(l_shipdate) AS BIGINT) AS e_text,
             CAST(epoch(l_shipdate) AS BIGINT) AS e_int,
             CAST(epoch(l_shipdate) AS BIGINT) AS e_julian
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber""")),

    // C1: bool = int64 != 0
    QueryDef("c02_bool_decode", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id", floor($"value").cast(LongType).as("cell"))
        .select($"event_id", SQLiteExprs.boolFromInt($"cell").as("b"))
        .groupBy($"b").agg(count(lit(1)).as("n"))
        .orderBy($"b")
    }, Some("""
      SELECT CAST(floor(value) AS BIGINT) != 0 AS b, count(*) AS n
      FROM events GROUP BY 1 ORDER BY b""")),

    // C3: uint64-beyond-Int64 text cells survive as Decimal(20,0)
    QueryDef("c03_uint64", (s, dir) => {
      import s.implicits._
      // build text cells ~1.8e19 (> Int64.max) from orderkeys
      t(s, dir, "orders")
        .select(concat(lit("1844674407370955"), lpad($"o_orderkey" % 10000, 4, "0"))
          .as("cell"))
        .select(SQLiteExprs.uint64FromText($"cell").as("u"))
        .agg(max($"u").cast(StringType).as("max_u"),
             min($"u").cast(StringType).as("min_u"),
             count(lit(1)).as("n"))
    }, Some("""
      SELECT CAST(max(u) AS VARCHAR) AS max_u, CAST(min(u) AS VARCHAR) AS min_u, count(*) AS n
      FROM (SELECT CAST('1844674407370955' || lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')
                        AS DECIMAL(20,0)) AS u FROM orders) x""")),

    // C5: dynamic `.any` cells via the variant struct round-trip
    QueryDef("c04_any_variant", (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "events")
      val tagged = e.select(
        $"event_id",
        when($"event_id" % 3 === 0, lit("int"))
          .when($"event_id" % 3 === 1, lit("real")).otherwise(lit("text")).as("ty"),
        when($"event_id" % 3 === 0, floor($"value").cast(LongType).cast(StringType))
          .when($"event_id" % 3 === 1, round($"value", 2).cast(StringType))
          .otherwise($"event_type").as("raw"))
      tagged
        .select($"event_id",
          SQLiteExprs.variantToString(SQLiteExprs.toVariant($"raw", $"ty")).as("rendered"))
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
                  WHEN event_id % 3 = 1 THEN CAST(round(value, 2) AS VARCHAR)
                  ELSE event_type END AS rendered
      FROM events ORDER BY event_id""")),

    // typeof() — SQLite's storage-class probe over dynamic cells
    QueryDef("c05_typeof", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select($"event_id",
          when($"event_id" % 5 === 0, lit(null).cast(StringType))
            .when($"event_id" % 3 === 0, lit("int"))
            .when($"event_id" % 3 === 1, lit("real"))
            .otherwise(lit("text")).as("ty"),
          // int-tagged cells must carry an integral rendering (as in c04):
          // the variant's int slot casts raw to LONG, an ANSI throw for
          // "523.47" if any later consumer evaluates the slot
          when($"event_id" % 3 === 0, floor($"value").cast(LongType).cast(StringType))
            .otherwise($"value".cast(StringType)).as("raw"))
        .select($"event_id",
          SQLiteExprs.typeofVariant(SQLiteExprs.toVariant($"raw", $"ty"))
            .as("storage_class"))
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN 'null'
                  WHEN event_id % 3 = 0 THEN 'integer'
                  WHEN event_id % 3 = 1 THEN 'real'
                  ELSE 'text' END AS storage_class
      FROM events ORDER BY event_id""")),

    // julianday()/unixepoch() — the write-side twins of the C4 tri-format
    // decode (same 2440587.5 epoch constant, lang_datefunc). The julian
    // day is compared as its EXACT integer-millisecond day number
    // (jd × 86400000, SQLite's internal iJD): the raw double's last ulp
    // depends on each engine's operation order, but every engine's
    // nearest-integer of it recovers the same iJD (accumulated error
    // ~4e-5 ms ≪ 0.5 ms). Inputs truncate to whole seconds so the
    // sqlite_fidelity replay (which carries seconds-precision text) can
    // diff the same cells.
    QueryDef("q81_julianday", (s, dir) => {
      import s.implicits._
      val tsSec = date_trunc("second", $"ts")
      t(s, dir, "events")
        .select($"event_id",
          round(SQLiteExprs.julianDay(tsSec) * 86400000.0)
            .cast(LongType).as("jd_ms"),
          SQLiteExprs.unixEpoch($"ts").as("ue"))
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id,
             CAST(round((epoch_us(date_trunc('second', ts)) / 1000000.0 / 86400.0
                         + 2440587.5) * 86400000.0) AS BIGINT) AS jd_ms,
             CAST(floor(epoch_us(ts) / 1000000.0) AS BIGINT) AS ue
      FROM events ORDER BY event_id"""))
  )
}
