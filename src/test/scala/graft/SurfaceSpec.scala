package graft

import org.apache.spark.sql.functions._
import graft.functions.{ScoredId, TopKAggregator}
import graft.operators.{Relational, Similarity}
import graft.sources.SQLiteIO

/** Remaining SURVEY §2 surface rows: S9 exec, S10 CSV round-trip, S11
  * pretty-print, A7 custom Aggregator, J9 as-of join semantics. */
class SurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("S9 exec runs semicolon-separated SQL against the session") {
    Tables.load(spark, sf, "region").createOrReplaceTempView("region_v")
    SQLiteIO.exec(spark,
      """CREATE OR REPLACE TEMP VIEW r2 AS SELECT * FROM region_v WHERE r_regionkey < 3;
         CREATE OR REPLACE TEMP VIEW r3 AS SELECT count(*) AS n FROM r2""")
    assert(spark.table("r3").as[Long].head() == 3L)
  }

  test("S10 CSV round-trip preserves data (reference: csvRepresentation)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val d = Seq(("do dishes", false, 17), ("mow lawn", true, 2)).toDF("description", "done", "prio")
    d.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(d.schema).csv(dir)
    assert(back.orderBy("description").collect().toSeq ==
           d.orderBy("description").collect().toSeq)
  }

  test("S11 show() renders (smoke)") {
    Tables.load(spark, sf, "region").show(2) // must not throw
  }

  test("S10b JSONL round-trip preserves data and types") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    // default timestampFormat writes millis only — micro-precision event
    // times need the explicit 6-digit fraction on BOTH sides
    val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    // deterministic subset — the frame is evaluated once for the write
    // and again for the comparison collect
    val d = Tables.load(spark, sf, "events").filter($"event_id" < 200)
    d.write.mode("overwrite").option("timestampFormat", tsFmt).json(dir)
    val back = spark.read.schema(d.schema).option("timestampFormat", tsFmt).json(dir)
    assert(back.orderBy("event_id").collect().toSeq ==
           d.orderBy("event_id").collect().toSeq)
  }

  test("S3 bindParameters: positional literals, quote-state, strict arity") {
    import SQLiteIO.bindParameters
    // rendering follows the reference's bind classes (SDF.swift:741-771)
    assert(bindParameters("SELECT ? a, ? b, ? c, ? d, ? e, ? f",
      Seq(42L, true, 12.25, "it's", Array[Byte](0x0a, -1),
        java.sql.Timestamp.valueOf("2024-02-29 12:34:56"))) ==
      "SELECT 42 a, 1 b, 12.25 c, 'it''s' d, X'0aff' e, " +
        "TIMESTAMP '2024-02-29 12:34:56' f")
    assert(bindParameters("SELECT ?", Seq(null)) == "SELECT NULL")
    assert(bindParameters("SELECT ?",
      Seq(new java.math.BigDecimal("18446744073709551615"))) ==
      "SELECT 18446744073709551615")
    // '?' inside string literals and quoted identifiers is never a
    // parameter — including after a doubled quote
    assert(bindParameters("SELECT '?', 'a''?', \"col?\", ? FROM t", Seq(7)) ==
      "SELECT '?', 'a''?', \"col?\", 7 FROM t")
    // strict arity both ways, like StatementSink
    intercept[IllegalArgumentException](bindParameters("SELECT ?", Seq(1, 2)))
    intercept[IllegalArgumentException](bindParameters("SELECT ?, ?", Seq(1)))
  }

  test("S3 bindParameters: '?' in comments and bracket/backtick identifiers") {
    import SQLiteIO.bindParameters
    // sqlite3_prepare's tokenizer skips comments and all three quoted-
    // identifier forms; a '?' inside any of them must pass through
    // verbatim and not consume a parameter (r5 advice: a '?' in a
    // comment used to corrupt the arity count)
    assert(bindParameters("SELECT ? -- is it ?\n, ? FROM t", Seq(1, 2)) ==
      "SELECT 1 -- is it ?\n, 2 FROM t")
    assert(bindParameters("SELECT ? /* what? */ , ? FROM t", Seq(1, 2)) ==
      "SELECT 1 /* what? */ , 2 FROM t")
    // line comment at end of statement (no trailing newline)
    assert(bindParameters("SELECT ? -- tail?", Seq(3)) == "SELECT 3 -- tail?")
    // unterminated block comment: comment to end, like sqlite3
    assert(bindParameters("SELECT ? /* open?", Seq(4)) == "SELECT 4 /* open?")
    assert(bindParameters("SELECT [a?b], `c?d`, ? FROM t", Seq(5)) ==
      "SELECT [a?b], `c?d`, 5 FROM t")
    // doubled backtick escape stays inside the identifier
    assert(bindParameters("SELECT `a``?`, ? FROM t", Seq(6)) ==
      "SELECT `a``?`, 6 FROM t")
    // '-' and '/' that do NOT open comments are ordinary chars
    assert(bindParameters("SELECT 1-?, 4/? FROM t", Seq(2, 2)) ==
      "SELECT 1-2, 4/2 FROM t")
    // Float widens to double before rendering (bind_double(Double(f)))
    assert(bindParameters("SELECT ?", Seq(0.1f)) ==
      "SELECT 0.10000000149011612")
  }

  test("S3 preparedScan: bound statement equals the hand-inlined query") {
    Tables.load(spark, sf, "customer").createOrReplaceTempView("customer")
    val got = SQLiteIO.preparedScan(spark,
      "SELECT c_custkey FROM customer WHERE c_acctbal > ? AND c_mktsegment <> ? ORDER BY c_custkey",
      Seq(9000.0, "BUILDING")).as[Long].collect().toSeq
    val want = spark.sql(
      "SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0 AND c_mktsegment <> 'BUILDING' ORDER BY c_custkey")
      .as[Long].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("README demo golden: tasks table S7-write → S1-read → rowid select") {
    // the reference's front-page demo (README.md:9-46): create `tasks`
    // (description TEXT, done BOOL default false, date DATE default
    // CURRENT_TIMESTAMP), insert three tasks, then
    //   select rowid, description, done, date from tasks order by rowid
    // Replayed end-to-end through this library's surface: codec ENCODE
    // to storage cells (bool→0/1 int, timestamp→"yyyy-MM-dd HH:mm:ss"
    // text — what the write path binds, SDF.swift:741-771), S7 table
    // sink + S8 existence probe (ParquetStore policy engine), S1 read
    // back, affinity-driven DECODE (SQLiteType.fromDeclared on the
    // demo's decls → boolFromInt / dateTriFromString), P4 rowid, and the
    // demo's projection — landing on exactly the README's table.
    import graft.functions.SQLiteExprs
    import graft.sources.ParquetStore
    import graft.types.{SQLiteCodec, SQLiteType}
    import org.apache.spark.sql.types.{LongType, StringType, TimestampType}
    val now = java.sql.Timestamp.valueOf("2022-01-04 15:30:12") // demo's clock
    val tasks = Seq("Walk dog", "Drink milk", "Write code")
      .map(d => (d, false, now)).toDF("description", "done", "date")
    // encode → write (S7 create) → probe (S8)
    val store = new ParquetStore(
      java.nio.file.Files.createTempDirectory("graft-readme").toString)
    val storage = tasks.select(
      $"description",
      SQLiteCodec.boolCodec.encode($"done").as("done"),
      SQLiteCodec.timestampCodec.encode($"date").as("date"))
    store.write(storage, "tasks", SQLiteIO.IfExists.Fail)
    assert(store.exists(spark, "tasks"), "S8 probe after create")
    // read (S1) → decode via the demo's declared types → rowid → select
    val decls = Map("description" -> "text", "done" -> "bool", "date" -> "DATE")
    assert(SQLiteType.fromDeclared(decls("done")) == SQLiteType.Bool &&
      SQLiteType.fromDeclared(decls("date")) == SQLiteType.Date &&
      SQLiteType.fromDeclared(decls("description")) == SQLiteType.Text)
    val back = store.read(spark, "tasks")
    val decoded = back
      .select(
        $"description",
        SQLiteExprs.boolFromInt($"done".cast(LongType)).as("done"),
        SQLiteExprs.dateTriFromString($"date".cast(StringType)).as("date"))
    val ordered = Relational.withRowId(decoded,
      Seq(when($"description" === "Walk dog", 1)
        .when($"description" === "Drink milk", 2).otherwise(3)))
      .select($"rowid", $"description", $"done", $"date")
      .orderBy($"rowid")
    assert(ordered.schema("done").dataType ==
      org.apache.spark.sql.types.BooleanType)
    assert(ordered.schema("date").dataType == TimestampType)
    assert(ordered.as[(Long, String, Boolean, java.sql.Timestamp)]
      .collect().toSeq == Seq(
        (1L, "Walk dog", false, now),
        (2L, "Drink milk", false, now),
        (3L, "Write code", false, now)))
    store.drop("tasks")
  }

  test("A7 TopKAggregator: bounded per-group top-k equals window top-k") {
    val agg = new TopKAggregator(3).toColumn
    val o = Tables.load(spark, sf, "orders")
    val viaAgg = o.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)]
      .map { case (c, k, p) => (c, ScoredId(k, p)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.name("topk"))
      .flatMap { case (cust, items) => items.map(i => (cust, i.id)) }
      .collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("J9 asofJoin strict vs inclusive tie semantics") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 20L)).toDF("id", "k", "t")
    val right = Seq((7L, 100L, 10L), (8L, 100L, 15L)).toDF("rid", "k", "t")
    val strict = Relational.asofJoin(left, right, "k", "t", "t", Seq("rid"), "m", strict = true)
      .select($"id", $"m.rid".as("rid")).as[(Long, Option[Long])].collect().toMap
    // left t=10: no right strictly earlier; left t=20: rid=8 (t=15)
    assert(strict(1L).isEmpty && strict(2L).contains(8L))
    val incl = Relational.asofJoin(left, right, "k", "t", "t", Seq("rid"), "m", strict = false)
      .select($"id", $"m.rid".as("rid")).as[(Long, Option[Long])].collect().toMap
    // left t=10: rid=7 at equal ts is now visible
    assert(incl(1L).contains(7L) && incl(2L).contains(8L))
  }

  test("rangeBandCount ≡ sliding RANGE frame (difference-of-cumulatives rewrite)") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, sf, "orders")
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
      .rangeBetween(-10000L, 0L)
    val sliding = orders
      .withColumn("n_in_band", count(lit(1)).over(w))
      .select($"o_orderkey", $"n_in_band")
      .as[(Long, Long)].collect().toMap
    val cum = Relational.rangeBandCount(orders, "o_orderpriority",
        "o_totalprice", width = 10000.0, idCol = "o_orderkey")
      .select($"o_orderkey", $"n_in_band")
      .as[(Long, Long)].collect().toMap
    assert(cum.size == sliding.size)
    val bad = sliding.collect { case (k, v) if cum(k) != v => (k, v, cum(k)) }
    assert(bad.isEmpty, s"divergent band counts: ${bad.take(5)}")
  }

  test("withGroupsFrameSum: GROUPS frame + EXCLUDE semantics on a hand-computed case") {
    // partition A, order by q: peer groups {q=1: 10,20}, {q=2: 30}, {q=3: 40}
    val df = Seq(("A", 1, 10.0), ("A", 1, 20.0), ("A", 2, 30.0), ("A", 3, 40.0))
      .toDF("p", "q", "x")
    val g = Relational.withGroupsFrameSum(df, "p", "q", "x", precedingGroups = 1)
      .select($"q", $"x", $"g_sum", $"g_sum_excl_row", $"g_sum_excl_group", $"g_sum_excl_ties")
      .as[(Int, Double, Double, Double, Double, Double)].collect().toSet
    assert(g == Set(
      // q=1 rows: frame = {q1} (no preceding group): sum 30
      (1, 10.0, 30.0, 20.0, 0.0, 10.0),
      (1, 20.0, 30.0, 10.0, 0.0, 20.0),
      // q=2: frame {q1,q2} = 60; peers of current = {30}
      (2, 30.0, 60.0, 30.0, 30.0, 60.0),
      // q=3: frame {q2,q3} = 70
      (3, 40.0, 70.0, 30.0, 30.0, 70.0)))
  }

  test("J/§2.7 surface wrappers agree with their Spark lowering (zero-caller sweep, r15)") {
    // These are the reference-API surface rows the §2 table anchors to
    // (SDF's join/compound verbs re-expressed as DataFrame verbs). The
    // sibling wrappers run inside driver queries; these seven had no
    // caller anywhere (the r14 verdict's dead-export sweep) — pin each
    // against the Spark lowering it documents so the surface is
    // executed, not just declared.
    import graft.operators.Relational
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y"), (4, "z")).toDF("k", "rv")
    val on = l("k") === r("k")
    assert(Relational.innerJoin(l, r, on).count() == 2)
    assert(Relational.rightJoin(l, r, on).count() == 3)
    assert(Relational.thetaJoin(l, r, l("k") < r("k")).count() == 6)
    assert(Relational.joinUsing(l, r, Seq("k")).columns.count(_ == "k") == 1)
    assert(Relational.joinUsing(l, r, Seq("k"), "full").count() == 4)
    val a = Seq(1, 1, 2).toDF("v")
    val b = Seq(1, 2, 2).toDF("v")
    assert(Relational.unionDistinct(a, b).count() == 2)
    assert(Relational.intersectAll(a, b).count() == 2) // {1, 2} with multiplicity min
    assert(Relational.exceptAll(a, b).count() == 1)    // one surplus 1
  }

  test("intervalJoin equals the theta join, incl. bin-boundary-spanning intervals") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000)
    // intervals deliberately spanning multiple 3600s bins and touching edges
    val left = Seq((1L, ts(100)), (1L, ts(3600)), (2L, ts(7200)), (1L, ts(7199)))
      .toDF("lk", "lt")
    val right = Seq((1L, ts(0), ts(3600)), (1L, ts(3500), ts(7300)),
        (2L, ts(7200), ts(7200)), (2L, ts(0), ts(100000)))
      .toDF("rk", "rs", "re")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"lk", $"lt", $"rs", $"re").as[(Long, Timestamp, Timestamp, Timestamp)]
        .collect().toSet
    for (incl <- Seq(true, false)) {
      val binned = key(Relational.intervalJoin(left, "lt", right, "rs", "re",
        Some(("lk", "rk")), binSeconds = 3600, inclusiveEnd = incl))
      val endCmp = if (incl) $"lt" <= $"re" else $"lt" < $"re"
      val theta = key(left.join(right,
        $"lk" === $"rk" && $"lt" >= $"rs" && endCmp))
      assert(binned == theta, s"inclusiveEnd=$incl mismatch")
    }
    // shared column names between the sides must not be ambiguous
    // (refs are frame-qualified internally); compare full row counts,
    // not deduplicated projections
    val lShared = left.withColumnRenamed("lk", "k")
    val rShared = right.withColumnRenamed("rk", "k").withColumn("extra", $"k")
    val n = Relational.intervalJoin(lShared, "lt", rShared, "rs", "re",
      Some(("k", "k")), binSeconds = 3600).count()
    assert(n == left.join(right, $"lk" === $"rk" && $"lt" >= $"rs" && $"lt" < $"re").count())
  }
}
