package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SQLiteExprs._
import graft.types.SQLiteCodec

/** Golden tests for the reference's decode semantics (SDF.swift:455-526),
  * esp. the date tri-format with the Julian constant 2440587.5. */
class SQLiteExprsSpec extends SparkSpec {
  import spark.implicits._

  test("C1 bool decode: int64 != 0") {
    val got = Seq(0L, 1L, -3L, 42L).toDF("c")
      .select(boolFromInt($"c").as("b")).as[Boolean].collect().toSeq
    assert(got == Seq(false, true, true, true))
  }

  test("C4 fused DateTriDecode ≡ composed form on adversarial + randomized cells") {
    // the fused one-pass classifier must agree with the rlike-dispatch
    // composition cell-for-cell: every representation, every malformed
    // near-miss the regexes reject, and a seeded random mix
    val edge = Seq(
      "2022-01-02 03:04:05", "1641092645", "-12345", "0",
      "2459581.627835648148", "2459581.5", "-1.5", "5.5e+2", "5.5E-2",
      "1.25e3",
      // near-misses: each falls through to the text parse → NULL
      "", " 5", "5 ", "+5", "-", "5.", ".5", "-.5", "5..5", "1e5",
      "5.5e", "5.5e+", "5.5e+x", "5.5.5", "abc", "2022-13-40 99:99:99",
      "2022-01-02T03:04:05", "2022-1-2 3:4:5", "0x1A", "NaN", "Infinity")
    val rnd = new scala.util.Random(1234)
    val fuzz = Seq.fill(300) {
      rnd.nextInt(6) match {
        case 0 => rnd.nextInt(2000000000).toString
        case 1 => s"${2440000 + rnd.nextInt(2000)}.${rnd.nextInt(999999)}"
        case 2 => f"20${rnd.nextInt(40)}%02d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d " +
          f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
        case 3 => rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString
        case 4 => s"${rnd.nextInt(100)}.${rnd.nextInt(100)}e${rnd.nextInt(3)}"
        case _ => s"-${rnd.nextInt(1000000)}"
      }
    }
    val df = (edge ++ fuzz).toDF("c").select($"c",
      dateTriFromString($"c").as("fused"),
      dateTriFromStringComposed($"c").as("composed"))
    val diff = df.filter(!($"fused" <=> $"composed")).collect()
    assert(diff.isEmpty,
      s"fused/composed divergence on: ${diff.map(_.getString(0)).mkString(", ")}")
  }

  test("C4 date tri-format: TEXT / unix seconds / julian day all decode") {
    val rows = Seq(
      "2022-01-02 03:04:05",   // TEXT, reference format
      "1641092645",            // same instant as unix seconds
      "2459581.627835648148"   // same instant as julian day
    ).toDF("c").select(dateTriFromString($"c").cast(LongType).as("epoch"))
      .as[Long].collect().toSeq
    assert(rows(0) == 1641092645L)
    assert(rows(1) == 1641092645L)
    assert(math.abs(rows(2) - 1641092645L) <= 1) // julian double rounding
  }

  test("julian epoch golden: JD 2440587.5 == 1970-01-01T00:00:00Z") {
    val got = Seq("2440587.5").toDF("c")
      .select(dateTriFromString($"c").cast(LongType).as("e"))
      .as[Long].head()
    assert(got == 0L)
  }

  test("C4 garbage text decodes to null, not an ANSI error") {
    val got = Seq("not a date").toDF("c")
      .select(dateTriFromString($"c").as("t")).collect()
    assert(got.head.isNullAt(0))
  }

  test("C6 date→text write format round-trips with tri-format read") {
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("1999-12-31T23:59:58Z"))
    val back = Seq(ts).toDF("t")
      .select(dateToText($"t").as("s"))
      .select(dateTriFromString($"s").as("t2"))
      .as[java.sql.Timestamp].head()
    assert(back == ts)
  }

  test("C3 uint64 > Int64.max survives via text → Decimal(20,0)") {
    val big = "18446744073709551615" // UInt64.max
    val got = Seq(big).toDF("c").select(uint64FromText($"c").as("d")).head().getDecimal(0)
    assert(got.toPlainString == big)
    val fits = Seq("42").toDF("c")
      .select(uint64FitsInt64(uint64FromText($"c")).as("f")).as[Boolean].head()
    assert(fits)
  }

  test("C5 variant struct: dynamic cells round-trip through typed slots") {
    val df = Seq(("1", "int"), ("2.5", "real"), ("hi", "text")).toDF("v", "ty")
    val got = df.select(variantToString(toVariant($"v", $"ty")).as("s"))
      .as[String].collect().toSeq
    assert(got == Seq("1", "2.5", "hi"))
  }

  test("GLOB → regex translation (SQLite semantics: *, ?, [seq], case-sensitive)") {
    val rows = Seq("Brand#12", "brand#12", "Brand#45", "Bx", "B!").toDF("s")
    def hits(p: String) = rows.filter(globFn($"s", p)).as[String].collect().toSet
    assert(hits("Brand#1*") == Set("Brand#12"))          // case-sensitive prefix
    assert(hits("B?") == Set("Bx", "B!"))                 // ? = single char
    assert(hits("Brand#[14]*") == Set("Brand#12", "Brand#45"))
    assert(hits("*rand*") == Set("Brand#12", "brand#12", "Brand#45"))
  }

  test("GLOB property: engine agrees with an independent reference matcher") {
    import org.scalacheck.Gen
    // direct recursive implementation of SQLite strglob semantics
    // (sqlite3.c, public source): case-sensitive full match; * any incl
    // \n; ? any one char; [set] with ^ negation, a-b ranges, a literal
    // ']' allowed right after '[' / '[^'; an UNCLOSED '[' means the
    // pattern matches nothing at all
    def globMatch(p: String, s: String): Boolean = {
      def parseSet(open: Int): Option[(Boolean, Seq[Either[Char, (Char, Char)]], Int)] = {
        var j = open + 1
        val neg = j < p.length && p(j) == '^'
        if (neg) j += 1
        val mem = Seq.newBuilder[Either[Char, (Char, Char)]]
        var first = true
        while (j < p.length && (first || p(j) != ']')) {
          if (j + 2 < p.length && p(j + 1) == '-' && p(j + 2) != ']') {
            mem += Right((p(j), p(j + 2))); j += 3
          } else { mem += Left(p(j)); j += 1 }
          first = false
        }
        if (j >= p.length) None else Some((neg, mem.result(), j))
      }
      def m(pi: Int, si: Int): Boolean =
        if (pi == p.length) si == s.length
        else p(pi) match {
          case '*' => (si to s.length).exists(k => m(pi + 1, k))
          case '?' => si < s.length && m(pi + 1, si + 1)
          case '[' =>
            parseSet(pi) match {
              case None => false // unclosed set: nothing matches
              case Some((neg, mem, close)) =>
                si < s.length && {
                  val ch = s(si)
                  val in = mem.exists {
                    case Left(c)         => c == ch
                    case Right((lo, hi)) => ch >= lo && ch <= hi
                  }
                  (in != neg) && m(close + 1, si + 1)
                }
            }
          case c => si < s.length && s(si) == c && m(pi + 1, si + 1)
        }
      m(0, 0)
    }
    val strings = Seq("", "a", "ab", "abc", "aXc", "Abc", "a\nc", "ac", "abcabc",
      "b", "c-a", "[ab]", "a?c", "a*", "cba", "aa\n", "abca", "ABC", "xyz", "a-c")
    val df = strings.toDF("s")
    val patChar = Gen.frequency(
      (6, Gen.oneOf('a', 'b', 'c', 'A', 'X')),
      (3, Gen.oneOf('*', '?')),
      (2, Gen.oneOf('[', ']', '^', '-')))
    val patterns = ((1 to 150).flatMap(i =>
      Gen.resize(7, Gen.listOf(patChar)).map(_.mkString)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
      ++ Seq("[", "[]", "[^]", "[]a]", "[^]a]", "[b-a]*", "a[z-a]", "[a-]", "[-a]",
             "[a[b]", "[^a-c]*", "a[", "*[ab"))
      .distinct
    patterns.foreach { p =>
      val got = df.filter(glob($"s", p)).as[String].collect().toSet
      val want = strings.filter(globMatch(p, _)).toSet
      assert(got == want, s"pattern <$p>: engine=$got reference=$want")
    }
  }

  test("GLOB wildcards cross newlines and exact shapes stay exact (SQLite semantics)") {
    val rows = Seq("a\nb", "ab", "a", "a\n").toDF("s")
    def hits(p: String) = rows.filter(globFn($"s", p)).as[String].collect().toSet
    assert(hits("a*b") == Set("a\nb", "ab"))  // * crosses \n
    assert(hits("a*") == Set("a\nb", "ab", "a", "a\n"))
    assert(hits("a") == Set("a"))             // no trailing-newline leniency
    assert(hits("a?") == Set("ab", "a\n"))    // ? matches \n too
  }
  private def globFn = (c: org.apache.spark.sql.Column, p: String) => glob(c, p)

  test("custom codec round-trip through a store (≈ custom codec write, Tests.swift:113-127)") {
    import graft.types.SQLiteCodec
    import graft.sources.{ParquetStore, SQLiteIO}
    // a CGPoint-style value stored via its text description (C6 fallback)
    val pts = Seq((1L, "(1.5, 2.5)"), (2L, "(3.0, 4.0)")).toDF("id", "pt")
    val enc = pts.select($"id", SQLiteCodec.descriptionFallback.encode($"pt").as("pt_cell"),
      SQLiteCodec[Boolean].encode($"id" % 2 === 0).as("even_cell"))
    val st = new ParquetStore(java.nio.file.Files.createTempDirectory("graft-codec").toString)
    st.write(enc, "pts", SQLiteIO.IfExists.Replace)
    val back = st.read(spark, "pts")
      .select($"id", SQLiteCodec.descriptionFallback.decode($"pt_cell").as("pt"),
        SQLiteCodec[Boolean].decode($"even_cell").as("even"))
      .orderBy($"id").as[(Long, String, Boolean)].collect().toSeq
    assert(back == Seq((1L, "(1.5, 2.5)", false), (2L, "(3.0, 4.0)", true)))
  }

  test("codec dispatch: bool codec encodes/decodes (≈ IntThing, Tests.swift:225-241)") {
    val enc = Seq(true, false).toDF("b")
      .select(SQLiteCodec[Boolean].encode($"b").as("cell"))
    assert(enc.as[Long].collect().toSeq == Seq(1L, 0L))
    val dec = enc.select(SQLiteCodec[Boolean].decode($"cell").as("b"))
    assert(dec.as[Boolean].collect().toSeq == Seq(true, false))
  }

  test("timestamp codec: storage text, reads any representation") {
    val c = SQLiteCodec[java.sql.Timestamp]
    val got = Seq("946684800").toDF("cell") // 2000-01-01 as unix text cell
      .select(c.decode($"cell").as("t"))
      .select(date_format($"t", "yyyy-MM-dd").as("d")).as[String].head()
    assert(got == "2000-01-01")
  }

  test("dateModifiers: SQLite modifier chains (lang_datefunc semantics)") {
    def run(ts: String, mods: String*): String =
      Seq(ts).toDF("c")
        .select(dateModifiers(to_timestamp($"c"), mods: _*).as("t"))
        .select(date_format($"t", "yyyy-MM-dd HH:mm:ss")).as[String].head()
    // start-of chain: month end via +1 month -1 day
    assert(run("2024-01-17 10:30:00", "start of month", "+1 month", "-1 day")
      == "2024-01-31 00:00:00")
    // signed units, applied left-to-right
    assert(run("2024-01-17 10:30:00", "-2 hours", "+90 minutes") == "2024-01-17 10:00:00")
    assert(run("2024-01-17 10:30:00", "start of year", "+9 hours") == "2024-01-01 09:00:00")
    // weekday 1 (Monday): 2024-01-17 is a Wednesday → advances to the
    // next Monday keeping time-of-day; a Monday stays put (no-op)
    assert(run("2024-01-17 10:30:00", "weekday 1") == "2024-01-22 10:30:00")
    assert(run("2024-01-15 10:30:00", "weekday 1") == "2024-01-15 10:30:00")
    // weekday 0 (Sunday) from a Saturday advances one day
    assert(run("2024-01-20 23:59:59", "weekday 0") == "2024-01-21 23:59:59")
    // unknown modifiers are a plan-time error, not a runtime one
    intercept[IllegalArgumentException] {
      dateModifiers($"c", "start of fortnight")
    }
  }

  test("dateModifiers: month arithmetic NORMALIZES like SQLite, never clamps") {
    // golden values from real sqlite3 datetime(ts, mod): out-of-range
    // days spill into the next month (date.c computeJD), where Spark's
    // add_months / DuckDB INTERVAL clamp to month end
    def run(ts: String, mods: String*): String =
      Seq(ts).toDF("c")
        .select(dateModifiers(to_timestamp($"c"), mods: _*).as("t"))
        .select(date_format($"t", "yyyy-MM-dd HH:mm:ss")).as[String].head()
    assert(run("2024-01-31 10:00:00", "+1 month")  == "2024-03-02 10:00:00")
    assert(run("2024-03-31 10:00:00", "-1 month")  == "2024-03-02 10:00:00")
    assert(run("2024-02-29 05:06:07", "+1 year")   == "2025-03-01 05:06:07")
    assert(run("2023-01-31 00:00:00", "+1 month")  == "2023-03-03 00:00:00")
    assert(run("2024-05-31 23:59:59", "+13 months") == "2025-07-01 23:59:59")
    assert(run("2024-01-15 08:00:00", "+1 month")  == "2024-02-15 08:00:00")
  }

  test("julianDay/unixEpoch: epoch constant round-trip, pre-1970 floor") {
    // julianday is dateFromJulian's inverse; unixepoch floors toward -∞
    // (1969-12-31 23:59:59 → -1, pinned against real sqlite3)
    val got = Seq("2024-01-31 10:00:00", "1970-01-01 00:00:00",
        "1969-12-31 23:59:59")
      .toDF("c")
      .select(
        round(julianDay(to_timestamp($"c")) * 86400000.0).cast(LongType).as("jd_ms"),
        unixEpoch(to_timestamp($"c")).as("ue"))
      .as[(Long, Long)].collect().toSeq
    assert(got(0) == (212573455200000L, 1706695200L)) // julianday=2460340.9166666665
    assert(got(1)._1 == math.round(2440587.5 * 86400000.0) && got(1)._2 == 0L)
    assert(got(2)._2 == -1L)
    // inverse property: dateFromJulian(julianDay(ts)) == ts at second
    // granularity (rounded — the double round-trip can land 1µs short,
    // same as c01's julian arm)
    val rt = Seq("2024-01-31 10:00:00").toDF("c")
      .select(round(dateFromJulian(julianDay(to_timestamp($"c"))).cast(DoubleType))
        .cast(LongType))
      .as[Long].head()
    assert(rt == 1706695200L)
  }

  test("sqliteCastInt/Real: numeric-prefix parse, 0 fallback, int64 clamp, never errors") {
    import graft.functions.SQLiteExprs._
    def runI(s: String): Long =
      Seq(s).toDF("c").select(sqliteCastInt($"c")).as[Long].head()
    def runR(s: String): Double =
      Seq(s).toDF("c").select(sqliteCastReal($"c")).as[Double].head()
    assert(runI("12abc") == 12L)
    assert(runI("abc") == 0L)         // SQLite: no prefix -> 0, never an error
    assert(runI("  42") == 42L)       // leading spaces ignored
    assert(runI("\t42") == 42L)       // SQLite skips ALL C whitespace, not just spaces
    assert(runI("\n\r 42") == 42L)
    assert(runI("3.9") == 3L)         // integer prefix only, not trunc(3.9) by parse
    assert(runI("-3.9xyz") == -3L)
    assert(runI("1e3") == 1L)         // exponent is not part of an integer prefix
    assert(runI("0000000005") == 5L)  // leading zeros don't defeat the length clamp
    assert(runI("99999999999999999999999") == Long.MaxValue)   // clamp, not throw
    assert(runI("-00099999999999999999999999") == Long.MinValue)
    assert(runI("9223372036854775807") == Long.MaxValue)       // exact boundary
    assert(runI("-9223372036854775808") == Long.MinValue)
    assert(runI("") == 0L)
    assert(runI("0x1A") == 0L)        // SQLite CAST does not parse hex
    assert(runR(".5e1x") == 5.0)      // real prefix includes fraction + exponent
    assert(runR("-3.9xyz") == -3.9)
    assert(runR("1e3") == 1000.0)
    assert(runR("abc") == 0.0)
  }

  test("sqliteSubstr: position-0, negative-start and negative-length edges") {
    import graft.functions.SQLiteExprs.sqliteSubstr
    def run(y: Int, z: Option[Int]): String =
      Seq("hello").toDF("c").select(sqliteSubstr($"c", y, z)).as[String].head()
    assert(run(2, Some(2)) == "el")
    assert(run(-2, None) == "lo")      // negative start counts from the right
    assert(run(0, Some(3)) == "he")    // virtual position 0 consumes length
    assert(run(-7, Some(3)) == "h")    // start before the string consumes too
    assert(run(3, Some(-2)) == "he")   // negative length: chars BEFORE position
    assert(run(-1, Some(-2)) == "ll")
    assert(run(2, Some(100)) == "ello")
    assert(run(0, None) == "hello")
    assert(run(9, Some(3)) == "")      // start past the end
  }

  test("nocaseKey folds ASCII A-Z only (SQLite NOCASE is not Unicode lower)") {
    def run(s: String): String =
      Seq(s).toDF("c").select(nocaseKey($"c")).as[String].head()
    assert(run("HeLLo") == "hello")
    assert(run("ÉCOLE") == "École")   // É untouched: NOCASE is ASCII-scoped
    assert(run("Ab-Z9é") == "ab-z9é")
    // and the over-merge lower() would cause: these two differ under NOCASE
    assert(run("XÉ") != run("xé"))
  }

  test("sqliteMin/MaxScalar: NULL in any argument propagates (SQLite rule)") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(1.0), None), (None, None))
      .toDF("a", "b")
    val got = df.select(
        sqliteMaxScalar($"a", $"b").as("mx"),
        sqliteMinScalar($"a", $"b").as("mn"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq
    assert(got == Seq((Some(2.0), Some(1.0)), (None, None), (None, None)))
  }

  test("sqliteLikeEscape: escaped wildcard is literal, case-insensitive default") {
    def run(s: String, pat: String): Boolean =
      Seq(s).toDF("c").select(sqliteLikeEscape($"c", pat, '!')).as[Boolean].head()
    assert(run("id_1x", "id!_1%"))      // escaped _ matches literal _
    assert(!run("idx1x", "id!_1%"))     // ...and nothing else
    assert(run("ID_1x", "id!_1%"))      // LIKE's case-insensitive default
    assert(run("50%", "50!%"))          // escaped % is literal %
    assert(!run("500", "50!%"))
    assert(run("a!b", "a!!b"))          // escape escapes itself
  }

  test("zeroblob: N zero bytes, empty at N=0") {
    val got = Seq(0, 1, 3).toDF("n")
      .select($"n", zeroblob($"n").as("b"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got(0).length == 0)
    assert(got(1).toSeq == Seq(0.toByte))
    assert(got(3).toSeq == Seq(0.toByte, 0.toByte, 0.toByte))
  }

  test("quoteVariant renders SQL literals: quote doubling, numbers, NULL") {
    def run(raw: String, ty: String): String =
      Seq((raw, ty)).toDF("raw", "ty")
        .select(quoteVariant(toVariant($"raw",
          when(lit(ty) === "null", lit(null).cast(StringType)).otherwise($"ty"))))
        .as[String].head()
    assert(run("it's", "text") == "'it''s'")
    assert(run("plain", "text") == "'plain'")
    assert(run("''", "text") == "''''''")
    assert(run("42", "int") == "42")
    assert(run("3.25", "real") == "3.25")
    assert(run("anything", "null") == "NULL")
  }

  test("quoteVariant reals match SQLite %!.15g across magnitude regimes") {
    // expectations verified against real sqlite3 (python 3.40): quote()
    // forces a decimal point, strips trailing zeros, drops -0.0's sign,
    // and switches to forced-point scientific outside [1e-4, 1e15)
    val cases = Seq(
      12.25    -> "12.25",
      12.0     -> "12.0",
      0.0      -> "0.0",
      -0.0     -> "0.0",
      1e7      -> "10000000.0",        // Java cast would render 1.0E7
      1.225e10 -> "12250000000.0",
      1e15     -> "1.0e+15",
      1.225e21 -> "1.225e+21",
      1e30     -> "1.0e+30",
      1.5e-5   -> "1.5e-05",
      0.1      -> "0.1",
      -42.5    -> "-42.5",
      0.000123 -> "0.000123")
    val got = cases.map(_._1).toDF("r")
      .select(graft.functions.SQLiteExprs.sqliteRealString($"r"))
      .as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"sqliteRealString($in): got $have, want $want")
    }
  }
}
