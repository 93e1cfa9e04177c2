package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The custom sort-merge as-of join operator (graft.plans.AsofJoinExec):
  * hand-computed semantics, differential equivalence against the
  * union+window form, and physical-plan shape. */
class AsofJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "l10"), (1L, 20L, "l20"), (1L, 5L, "l5"),
    (2L, 10L, "m10"), (3L, 10L, "n10")).toDF("k", "ts", "lv")
  private def right = Seq(
    (1L, 5L, "r5"), (1L, 15L, "r15"), (2L, 10L, "s10"),
    (4L, 1L, "t1")).toDF("k", "ts", "rv")

  test("asofJoinNative: strict and inclusive tie semantics, misses are NULL") {
    val strict = Relational.asofJoinNative(left, right, "k", "ts", "ts", Seq("rv"))
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    // k=1: l5 sees nothing (r5 not < 5); l10 sees r5; l20 sees r15
    // k=2: m10 does NOT see s10 under strict (ts equal); k=3: no right
    assert(strict == Map("l5" -> None, "l10" -> Some("r5"), "l20" -> Some("r15"),
      "m10" -> None, "n10" -> None))
    val incl = Relational.asofJoinNative(left, right, "k", "ts", "ts", Seq("rv"),
        strict = false)
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(incl == Map("l5" -> Some("r5"), "l10" -> Some("r5"),
      "l20" -> Some("r15"), "m10" -> Some("s10"), "n10" -> None))
  }

  test("asofJoinNative: NULL keys and timestamps match nothing, on either side") {
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "ts", "lv")
    val r = Seq((Some(1L), Some(5L), "r5"), (Some(1L), None, "rnull"),
      (None, Some(1L), "rk")).toDF("k", "ts", "rv")
    val got = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"))
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(got == Map("a" -> Some("r5"), "b" -> None, "c" -> None))
  }

  test("asofJoinNative: empty right side leaves every left row unmatched") {
    val got = Relational.asofJoinNative(left, right.filter(lit(false)),
        "k", "ts", "ts", Seq("rv"))
      .select($"rv").collect()
    assert(got.length == left.count() && got.forall(_.isNullAt(0)))
  }

  test("asofJoinNative: mismatched key/ts types fail at plan construction") {
    // the merge loop picks primitive accessors from the LEFT side's types
    // and applies them to right rows — a type mismatch must be an error at
    // plan construction, never silent garbage matches
    val intRight = right.withColumn("ts", $"ts".cast("int"))
    val e1 = intercept[IllegalArgumentException] {
      Relational.asofJoinNative(left, intRight, "k", "ts", "ts", Seq("rv"))
    }
    assert(e1.getMessage.contains("ts types must match"))
    val intKeyRight = right.withColumn("k", $"k".cast("int"))
    val e2 = intercept[IllegalArgumentException] {
      Relational.asofJoinNative(left, intKeyRight, "k", "ts", "ts", Seq("rv"))
    }
    assert(e2.getMessage.contains("key types must match"))
  }

  test("asofJoinNative: right-side (key, ts) ties resolve deterministically") {
    // tie contract: backward picks the payload-wise MAX row, forward the
    // MIN — a pure function of the data, not of partition/sort order
    val l = Seq((1L, 10L, "l")).toDF("k", "ts", "lv")
    val r = Seq((1L, 5L, "a"), (1L, 5L, "z"), (1L, 5L, "m"),
      (1L, 20L, "fa"), (1L, 20L, "fz")).toDF("k", "ts", "rv")
    val back = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"))
      .select($"rv").as[String].head()
    assert(back == "z", s"backward tie must pick payload-wise max, got $back")
    val fwd = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"),
        forward = true)
      .select($"rv").as[String].head()
    assert(fwd == "fa", s"forward tie must pick payload-wise min, got $fwd")
  }

  test("asofJoinNative ≡ asofJoin (union+window form) on the q44 shape") {
    val ev = Tables.load(spark, sf, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_event"), $"user_id", $"ts")
    for (strict <- Seq(true, false)) {
      val native = Relational.asofJoinNative(purchases, clicks, "user_id",
          "ts", "ts", Seq("click_event"), strict = strict)
        .select($"event_id", $"click_event")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val windowed = Relational.asofJoin(purchases, clicks, "user_id", "ts", "ts",
          rightPayload = Seq("click_event"), asofCol = "m", strict = strict)
        .select($"event_id", $"m.click_event")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(native.size == windowed.size && native == windowed,
        s"strict=$strict divergence")
    }
  }

  test("asofJoinNative forward: earliest subsequent right row, both merge paths") {
    // fast path (long keys)
    val fwd = Relational.asofJoinNative(left, right, "k", "ts", "ts", Seq("rv"),
        strict = true, forward = true)
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    // k=1: l5 -> r5(ts5>5? strict: no, 5 !> 5... r5 at ts 5, l5 at ts 5: strict -> r15)
    //       l5 sees r15? earliest > 5 is r15? no — r5 ts=5 not > 5, so r15. Wait r5=ts5.
    assert(fwd == Map("l5" -> Some("r15"), "l10" -> Some("r15"),
      "l20" -> None, "m10" -> None, "n10" -> None))
    val fwdIncl = Relational.asofJoinNative(left, right, "k", "ts", "ts", Seq("rv"),
        strict = false, forward = true)
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(fwdIncl == Map("l5" -> Some("r5"), "l10" -> Some("r15"),
      "l20" -> None, "m10" -> Some("s10"), "n10" -> None))
    // generic path (string keys)
    val l = Seq(("a", 10L, "x"), ("b", 7L, "y")).toDF("k", "ts", "lv")
    val r = Seq(("a", 12L, "r12"), ("b", 7L, "s7")).toDF("k", "ts", "rv")
    val g = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"),
        strict = true, forward = true)
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(g == Map("x" -> Some("r12"), "y" -> None))
  }

  test("asofJoinNative forward ≡ min-over-pairs recompute on randomized inputs") {
    val rnd = new scala.util.Random(77)
    val lRows = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, rnd.nextInt()))
    val rRows = Seq.fill(200)((rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, rnd.nextInt()))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // no right (k, ts) ties
    val l = lRows.toDF("k", "ts", "lv").repartition(4)
    val r = rRows.toDF("k", "ts", "rv").repartition(3)
    val got = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"),
        strict = true, forward = true)
      .toDF("k", "ts", "lv", "rv")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2),
        if (x.isNullAt(3)) None else Some(x.getInt(3)))).sorted.toSeq
    // reference: min-ts right per left over the full pair set
    val byKey = rRows.groupBy(_._1)
    val expect = lRows.map { case (k, ts, lv) =>
      val nxt = byKey.getOrElse(k, Nil).filter(_._2 > ts).sortBy(_._2).headOption
      (k, ts, lv, nxt.map(_._3))
    }.sorted.toSeq
    assert(got == expect)
  }

  test("asofJoinNative: string keys take the typed-comparator merge path, same semantics") {
    val l = Seq(("a", 10L, "l10"), ("a", 5L, "l5"), ("b", 7L, "m7"))
      .toDF("k", "ts", "lv")
    val r = Seq(("a", 6L, "r6"), ("b", 7L, "s7")).toDF("k", "ts", "rv")
    val strictGot = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"))
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(strictGot == Map("l10" -> Some("r6"), "l5" -> None, "m7" -> None))
    val inclGot = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"),
        strict = false)
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(inclGot == Map("l10" -> Some("r6"), "l5" -> None, "m7" -> Some("s7")))
  }

  test("asofJoinNative: string/decimal keys ≡ pair recompute on randomized inputs") {
    // the UTF8String/Decimal comparator path must agree with a
    // from-first-principles recompute over the full pair set — including
    // multi-char keys that differ only in a late byte (binary compare)
    // and negative/zero decimals
    val rnd = new scala.util.Random(42)
    val keys = Vector("kk", "kk0", "ka", "k", "zz", "a~b", "a b")
    val lRows = Seq.fill(250)((keys(rnd.nextInt(keys.size)),
      rnd.nextInt(200).toLong, rnd.nextInt()))
    val rRows = Seq.fill(150)((keys(rnd.nextInt(keys.size)),
      rnd.nextInt(200).toLong, rnd.nextInt()))
    val l = lRows.toDF("k", "ts", "lv").repartition(4)
    val r = rRows.toDF("k", "ts", "rv").repartition(3)
    for (strict <- Seq(true, false); forward <- Seq(true, false)) {
      val native = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"),
          strict = strict, forward = forward)
        .toDF("k", "ts", "lv", "rv").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getInt(2),
          if (x.isNullAt(3)) None else Some(x.getInt(3)))).sorted.toSeq
      // reference recompute over the full pair set with the exec's
      // deterministic tiebreak (max payload backward, min forward)
      val byKey = rRows.groupBy(_._1)
      val expect = lRows.map { case (k, ts, lv) =>
        val cands = byKey.getOrElse(k, Nil).filter { case (_, rts, _) =>
          if (forward) { if (strict) rts > ts else rts >= ts }
          else { if (strict) rts < ts else rts <= ts }
        }
        val pick =
          if (cands.isEmpty) None
          else if (forward) {
            val m = cands.map(_._2).min
            Some(cands.filter(_._2 == m).map(_._3).min)
          } else {
            val m = cands.map(_._2).max
            Some(cands.filter(_._2 == m).map(_._3).max)
          }
        (k, ts, lv, pick)
      }.sorted.toSeq
      assert(native == expect, s"strict=$strict forward=$forward")
    }
    // decimal keys ride the same path
    val ld = Seq((BigDecimal("1.50"), 10L, 1), (BigDecimal("-2.25"), 9L, 2),
      (BigDecimal("0.00"), 5L, 3)).toDF("k", "ts", "lv")
    val rd = Seq((BigDecimal("1.50"), 8L, 100), (BigDecimal("-2.25"), 9L, 200),
      (BigDecimal("0.00"), 9L, 300)).toDF("k", "ts", "rv")
    val got = Relational.asofJoinNative(ld, rd, "k", "ts", "ts", Seq("rv"))
      .toDF("k", "ts", "lv", "rv").collect()
      .map(x => x.getInt(2) -> (if (x.isNullAt(3)) None else Some(x.getInt(3))))
      .toMap
    assert(got == Map(1 -> Some(100), 2 -> None, 3 -> None))
  }

  test("asofJoinNative ≡ asofJoin on randomized inputs (seeded)") {
    val rnd = new scala.util.Random(424242)
    // duplicate (k, ts) pairs across sides and within the left side are
    // common; right-side ts ties are kept out (tie winner among equal
    // right rows is unspecified in BOTH implementations)
    val lRows = Seq.fill(400)((rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
    val rAll = Seq.fill(300)((rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
    val rRows = rAll.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val l = lRows.toDF("k", "ts", "lv").repartition(5)
    val r = rRows.toDF("k", "ts", "rv").repartition(3)
    for (strict <- Seq(true, false)) {
      val native = Relational.asofJoinNative(l, r, "k", "ts", "ts", Seq("rv"), strict)
        .toDF("k", "ts", "lv", "rv")
        .select($"k", $"ts", $"lv", $"rv")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2),
          if (x.isNullAt(3)) None else Some(x.getInt(3)))).sorted.toSeq
      val windowed = Relational.asofJoin(l, r, "k", "ts", "ts",
          rightPayload = Seq("rv"), asofCol = "m", strict = strict)
        .select($"k", $"ts", $"lv", $"m.rv")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2),
          if (x.isNullAt(3)) None else Some(x.getInt(3)))).sorted.toSeq
      assert(native == windowed, s"strict=$strict divergence")
    }
  }

  test("asofJoinNative: self-join (shared attribute ids) is de-duplicated") {
    val df = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "ts", "v")
    val got = Relational.asofJoinNative(df, df, "k", "ts", "ts", Seq("v"))
      .toDF("k", "ts", "v", "asof_v") // duplicate names, as after any join
      .select($"v", $"asof_v")
      .as[(String, Option[String])].collect().toMap
    // strict: row "a" (ts 10) sees nothing earlier; "b" (ts 20) sees "a"
    assert(got == Map("a" -> None, "b" -> Some("a")))
  }

  test("plan: AsofJoinExec with one exchange + sort per side, ordered output") {
    val df = Relational.asofJoinNative(left, right, "k", "ts", "ts", Seq("rv"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), s"expected the custom operator:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"expected exactly one hash exchange per side:\n$p")
    assert("Sort \\[".r.findAllIn(p).size == 2,
      s"expected EnsureRequirements to add one sort per side:\n$p")
    // output ordering is declared: an orderBy on (k, ts) must add no sort
    val sorted = df.orderBy($"k", $"ts")
    val p2 = sorted.queryExecution.executedPlan.toString
    assert("Sort \\[".r.findAllIn(p2).size <= 3,
      s"downstream per-key sort should reuse the operator's ordering:\n$p2")
  }
}
