package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's per-cell decode/encode semantics (SURVEY.md §2.8),
  * re-expressed as compositions of codegen'd built-in expressions — no
  * UDFs, so everything stays inside whole-stage codegen at 100 TB.
  */
object SQLiteExprs {

  /** C1 (SDF.swift:455-456): SQLite bool = int64 != 0. */
  def boolFromInt(c: Column): Column = c =!= lit(0L)

  /** Julian-day epoch constant (SDF.swift:506, SQLite date doc). */
  val JulianUnixEpoch = 2440587.5
  val SecondsPerDay   = 86400.0

  /** C4 (SDF.swift:491-511): SQLite's tri-representation date decode.
    * A date cell may arrive as
    *   TEXT  "yyyy-MM-dd HH:mm:ss"  → parsed with that exact format
    *   INT   Unix epoch seconds     → timestamp_seconds
    *   REAL  Julian day number      → (jd - 2440587.5) * 86400 seconds
    * The reference switches on the runtime cell type; with a fixed-schema
    * string column we decode by shape: text timestamps parse, pure
    * integers are epoch seconds, decimals are Julian days.
    */
  def dateTriFromString(c: Column): Column =
    graft.functions.DateTriDecode.dateTri(c)

  /** The pure-built-in composition of the same decode — two rlike
    * classifiers + per-shape dispatch. Kept as [[dateTriFromString]]'s
    * differential oracle (SQLiteExprsSpec) and as the form that needs no
    * custom expression; the fused `DateTriDecode` classifies in one byte
    * walk (~4 regex machines per row saved on every date read). */
  def dateTriFromStringComposed(c: Column): Column = {
    val asText   = try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss"))
    val isInt    = c.rlike("^-?\\d+$")
    val isReal   = c.rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$")
    val fromInt  = timestamp_seconds(c.cast(LongType))
    val fromReal = timestamp_seconds(
      (c.cast(DoubleType) - lit(JulianUnixEpoch)) * lit(SecondsPerDay))
    when(isInt, fromInt).when(isReal, fromReal).otherwise(asText)
  }

  /** Typed variants for when the storage type is already known. */
  def dateFromUnixSeconds(c: Column): Column = timestamp_seconds(c)
  def dateFromJulian(c: Column): Column =
    timestamp_seconds((c - lit(JulianUnixEpoch)) * lit(SecondsPerDay))

  /** SQLite `julianday(X)` (lang_datefunc): the fractional Julian day
    * number — inverse of [[dateFromJulian]], same epoch constant. */
  def julianDay(c: Column): Column =
    c.cast(DoubleType) / lit(SecondsPerDay) + lit(JulianUnixEpoch)

  /** SQLite `unixepoch(X)` (3.38+): whole epoch seconds, floored toward
    * -∞ like SQLite's integer conversion of the internal day number
    * (pre-1970 instants with fractional seconds round DOWN, so
    * 1969-12-31 23:59:59 → -1). */
  def unixEpoch(c: Column): Column =
    floor(c.cast(DoubleType)).cast(LongType)

  /** C6 write-side (SDF.swift:636-640): dates encode as TEXT with the
    * same fixed format. */
  def dateToText(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  private val SignedUnit =
    "^([+-]?\\d+)\\s+(second|minute|hour|day|month|year)s?$".r
  private val WeekdayN = "^weekday\\s+([0-6])$".r

  /** SQLite date-function modifier chain (`datetime(ts, 'start of month',
    * '+1 month', '-1 day')` — sqlite.org/lang_datefunc.html, reachable
    * through the reference's SQL entry points SDF.swift:295-304), applied
    * left-to-right as codegen'd built-ins:
    *   - `start of month|year|day`  → date_trunc
    *   - `±N second|minute|hour|day|month|year[s]` → interval arithmetic
    *     (note: month/year adds clamp at month end like Spark/DuckDB —
    *     SQLite instead normalizes Jan 31 + 1 month to Mar 3; documented
    *     dialect gap, same class as W4 GROUPS frames)
    *   - `weekday N` (0=Sunday) → advance to the next such weekday,
    *     keeping the time of day (no-op when already on it)
    * Modifier strings are validated at plan-build time — an unknown
    * modifier throws immediately, not per-row. */
  def dateModifiers(c: Column, mods: String*): Column =
    mods.foldLeft(c) { (acc, raw) =>
      raw.trim.toLowerCase match {
        case "start of day"   => date_trunc("day", acc)
        case "start of month" => date_trunc("month", acc)
        case "start of year"  => date_trunc("year", acc)
        case SignedUnit(n, unit) if unit == "month" || unit == "year" =>
          // SQLite NORMALIZES month arithmetic (date.c: M is shifted, D
          // kept, and the day-count formula lets an out-of-range D spill
          // into the next month — Jan 31 + 1 month = Mar 2/3), where
          // Spark's add_months and DuckDB's INTERVAL clamp to month end.
          // Faithful lowering: shift the FIRST of the month (day 1 can't
          // clamp), then re-add (day-1) as plain day arithmetic, then the
          // time of day.
          val months = if (unit == "year") n.toInt * 12 else n.toInt
          val shifted = add_months(date_trunc("month", acc).cast(DateType), months)
          date_add(shifted, dayofmonth(acc) - lit(1)).cast(TimestampType) +
            (acc - date_trunc("day", acc))
        case SignedUnit(n, unit) =>
          acc + expr(s"INTERVAL '$n' ${unit.toUpperCase}")
        case WeekdayN(n) =>
          // Spark dayofweek: 1=Sunday..7=Saturday; SQLite weekday: 0=Sunday
          val delta = (lit(7 + n.toInt) - (dayofweek(acc) - lit(1))) % lit(7)
          acc + make_dt_interval(delta)
        case other =>
          throw new IllegalArgumentException(s"unsupported date modifier: $other")
      }
    }

  /** C3 (SDF.swift:473-479): UInt64 survives via TEXT when > Int64.max.
    * Spark has no unsigned types → DecimalType(20,0) escape hatch. */
  def uint64FromText(c: Column): Column = c.cast(DecimalType(20, 0))

  /** C3 write side (SDF.swift:617-623): a decimal that still fits Int64
    * binds as an integer cell; above Int64.max it falls back to its text
    * representation so the value survives (SQLite cells are dynamic; our
    * single-typed write column is the textual form, lossless either way). */
  def uint64FitsInt64(c: Column): Column =
    c <= lit(new java.math.BigDecimal(Long.MaxValue))

  /** SQLite GLOB pattern → anchored Java/RE2 regex: `*` → `.*`, `?` →
    * `.`, `[seq]` passes through (incl. `[^...]`), everything else
    * quoted. Case-sensitive, full-string match — SQLite GLOB semantics:
    * `(?s)` because GLOB wildcards cross newlines, `\z` because `$`
    * would also accept a match before a trailing newline. */
  /** A bracket set's members: literal chars and lo–hi ranges. SQLite's
    * `strglob` rules (sqlite3.c, public source): a `]` immediately after
    * `[` or `[^` is a literal member and the set runs to the NEXT `]`;
    * an unclosed `[` makes the whole pattern match NOTHING; an inverted
    * range (`[z-a]`) is simply never satisfied (no error). Returns the
    * parsed (negated, members, closeIndex) or None when unclosed. */
  private def parseGlobSet(glob: String, open: Int)
      : Option[(Boolean, Seq[Either[Char, (Char, Char)]], Int)] = {
    var j = open + 1
    val neg = j < glob.length && glob.charAt(j) == '^'
    if (neg) j += 1
    val members = Seq.newBuilder[Either[Char, (Char, Char)]]
    var first = true
    while (j < glob.length && (first || glob.charAt(j) != ']')) {
      val c = glob.charAt(j)
      if (j + 2 < glob.length && glob.charAt(j + 1) == '-' && glob.charAt(j + 2) != ']') {
        members += Right((c, glob.charAt(j + 2))); j += 3
      } else {
        members += Left(c); j += 1
      }
      first = false
    }
    if (j >= glob.length) None else Some((neg, members.result(), j))
  }

  def globToRegex(glob: String): String = {
    val neverMatch = "(?!)" // empty negative lookahead: fails at any position
    def classEscape(c: Char): String =
      if ("\\[]&^-".indexOf(c.toInt) >= 0) "\\" + c else c.toString
    val sb = new StringBuilder("(?s)^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append('.')
        case '[' =>
          parseGlobSet(glob, i) match {
            case None => return neverMatch // unclosed set: SQLite matches nothing
            case Some((neg, members, close)) =>
              // drop inverted ranges (never satisfiable, Java would throw)
              val kept = members.filter { case Right((lo, hi)) => lo <= hi; case _ => true }
              if (kept.isEmpty) {
                if (neg) sb.append(".") // negation of nothing: any char ((?s) dotall)
                else sb.append(neverMatch) // positive empty set: fails here
              } else {
                sb.append('[')
                if (neg) sb.append('^')
                kept.foreach {
                  case Left(c)         => sb.append(classEscape(c))
                  case Right((lo, hi)) => sb.append(classEscape(lo)).append('-').append(classEscape(hi))
                }
                sb.append(']')
              }
              i = close
          }
        case c if "\\.[]{}()<>*+-=!?^$|".indexOf(c.toInt) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("\\z").toString
  }

  /** SQLite LIKE is case-INSENSITIVE by default (for ASCII; sqlite.org
    * datatype3 §LIKE, reachable through the reference's SQL entry points
    * SDF.swift:295-304) — Spark/ANSI LIKE is case-sensitive, so the
    * faithful lowering is `ilike`. Documented delta: `ilike` folds case
    * for all of Unicode, SQLite only for A–Z (its `case_sensitive_like`
    * pragma and unicode extension change this anyway). */
  def sqliteLike(c: Column, pattern: String): Column = c.ilike(pattern)

  /** SQLite `LIKE pattern ESCAPE esc` (sqlite.org/lang_expr.html#like):
    * the escape character makes the following `%`/`_` (or itself) literal.
    * Same case-insensitive default as [[sqliteLike]], hence the
    * three-argument `ilike`. */
  def sqliteLikeEscape(c: Column, pattern: String, esc: Char): Column =
    ilike(c, lit(pattern), lit(esc.toString))

  /** SQLite `zeroblob(N)` (sqlite.org/lang_corefunc.html#zeroblob): a
    * BLOB of N 0x00 bytes. Composed as unhex(repeat('00', N)) — both
    * codegen'd built-ins. */
  def zeroblob(n: Column): Column = unhex(call_function("repeat", lit("00"), n))

  private val AsciiUpper = ('A' to 'Z').mkString
  private val AsciiLower = ('a' to 'z').mkString

  /** SQLite NOCASE collation key: folds A–Z only (sqlite3StrICmp — the
    * built-in NOCASE is explicitly ASCII-scoped, unlike Unicode-aware
    * `lower()`). `ORDER BY … COLLATE NOCASE`, `GROUP BY`, `=` and DISTINCT
    * under NOCASE all lower to sorting/grouping on this key. `translate`
    * is a codegen'd built-in, and the identical call exists in DuckDB so
    * oracles replicate the fold exactly. */
  def nocaseKey(c: Column): Column = translate(c, AsciiUpper, AsciiLower)

  /** SQLite scalar `max(X,Y,…)` / `min(X,Y,…)` return NULL when ANY
    * argument is NULL (sqlite.org/lang_corefunc.html) — the opposite of
    * Spark/ANSI `greatest`/`least`, which skip NULLs. q52 pins the
    * skip-NULLs surface; these pin SQLite's. */
  def sqliteMaxScalar(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(greatest(cols: _*))
  def sqliteMinScalar(cols: Column*): Column =
    when(cols.map(_.isNull).reduce(_ || _), lit(null)).otherwise(least(cols: _*))

  /** GLOB as a Column predicate. The four shapes that dominate real
    * predicates — exact, `lit*`, `*lit`, `*lit*` — compile to string
    * predicates instead of a regex: those push down to the parquet scan
    * (`StringStartsWith` & co. prune row groups via column statistics)
    * and stay cheap per row, where a regex is opaque to every source.
    * Everything else falls back to the full anchored-regex translation.
    * (General `rlike` filters with a literal-prefix shape get the same
    * treatment from the [[graft.plans.RegexPrefixPushdown]] optimizer
    * rule.) */
  def glob(c: Column, pattern: String): Column = {
    val meta = "*?[".toSet
    def pure(s: String) = !s.exists(meta)
    val body = pattern.drop(1).dropRight(1)
    pattern match {
      case p if pure(p) => c === lit(p)
      case p if p.length >= 2 && p.endsWith("*") && !p.startsWith("*") && pure(p.dropRight(1)) =>
        c.startsWith(p.dropRight(1))
      case p if p.length >= 2 && p.startsWith("*") && !p.endsWith("*") && pure(p.drop(1)) =>
        c.endsWith(p.drop(1))
      case p if p.length >= 3 && p.startsWith("*") && p.endsWith("*") && body.nonEmpty && pure(body) =>
        c.contains(body)
      case _ => c.rlike(globToRegex(pattern))
    }
  }

  /** C2 (SDF.swift:457-472): integer width narrowing. ANSI-mode cast
    * (throws on overflow) is our documented divergence from Swift's trap
    * (SURVEY.md §7.4). */
  def narrow(c: Column, to: DataType): Column = c.cast(to)

  /** SQLite `CAST(text AS INTEGER)` (reachable through the reference's SQL
    * entry points, SDF.swift:295-304): the longest integer prefix after
    * optional leading spaces; no prefix → 0; out-of-int64-range clamps to
    * the boundary. NEVER errors — the opposite of Spark's ANSI cast, which
    * is why this is an explicit emulation, not `cast`. Leading zeros are
    * stripped before the length-based clamp so '000…0005' stays 5. */
  def sqliteCastInt(c: Column): Column = {
    // SQLite skips ALL C whitespace (sqlite3Isspace: space \t \n \v \f
    // \r); ltrim trims spaces only, hence the explicit class (identical
    // in Java regex and RE2, so oracles reuse the pattern verbatim)
    val t = regexp_replace(c, lit("^[ \\t\\n\\u000B\\f\\r]+"), lit(""))
    val sign = regexp_extract(t, "^([+-])", 1)
    val digits = regexp_extract(t, "^[+-]?0*([0-9]+)", 1)
    when(digits === "", lit(0L))
      .when(length(digits) > 19,
        when(sign === "-", lit(Long.MinValue)).otherwise(lit(Long.MaxValue)))
      .otherwise(
        least(greatest(concat(sign, digits).cast(DecimalType(20, 0)),
          lit(Long.MinValue).cast(DecimalType(20, 0))),
          lit(Long.MaxValue).cast(DecimalType(20, 0))).cast(LongType))
  }

  /** SQLite `CAST(text AS REAL)`: the longest real-number prefix
    * (optional sign, digits with optional fraction, optional exponent);
    * no prefix → 0.0. Never errors. */
  def sqliteCastReal(c: Column): Column = {
    val p = regexp_extract(regexp_replace(c, lit("^[ \\t\\n\\u000B\\f\\r]+"), lit("")),
      "^[+-]?([0-9]+([.][0-9]*)?|[.][0-9]+)([eE][+-]?[0-9]+)?", 0)
    when(p === "", lit(0.0)).otherwise(p.cast(DoubleType))
  }

  /** SQLite `substr(X, Y[, Z])` semantics, which Spark's substring does
    * not share at the edges: position 0 is a virtual character that
    * CONSUMES length (substr('hello',0,3) = 'he', Spark gives 'hel');
    * negative Y counts from the right; negative Z takes the |Z|
    * characters PRECEDING position Y (Spark returns ''). DuckDB's substr
    * matches SQLite on all of these, so oracles can use it verbatim. */
  def sqliteSubstr(c: Column, y: Int, z: Option[Int] = None): Column = {
    val p0: Column = if (y < 0) length(c) + lit(y + 1) else lit(y)
    z match {
      case None =>
        c.substr(greatest(p0, lit(1)), length(c))
      case Some(zz) if zz >= 0 =>
        val start = greatest(p0, lit(1))
        c.substr(start, greatest(lit(zz) - (start - p0), lit(0)))
      case Some(zz) =>
        val start = greatest(p0 + lit(zz), lit(1))
        c.substr(start, greatest(p0 - start, lit(0)))
    }
  }

  /** C5 (SDF.swift:513-526): `.any` dynamic cells. Fixed-schema engine →
    * a variant struct carrying the runtime type tag plus one slot per
    * SQLite storage class. Build one from any typed column: */
  def toVariant(c: Column, cellType: Column): Column = struct(
    cellType.as("t"),
    when(cellType === "int", c.cast(LongType)).as("i"),
    when(cellType === "real", c.cast(DoubleType)).as("r"),
    when(cellType === "text", c.cast(StringType)).as("s"))

  /** Render a variant back to its display string (the `.any` read path). */
  def variantToString(v: Column): Column =
    when(v.getField("t") === "int",  v.getField("i").cast(StringType))
      .when(v.getField("t") === "real", v.getField("r").cast(StringType))
      .otherwise(v.getField("s"))

  /** SQLite's REAL rendering as used by `quote()` (sqlite/src/func.c
    * quoteFunc: `"%!.15g"` — 15 significant digits, trailing zeros
    * stripped, decimal point FORCED so a real never prints like an int;
    * negative zero prints "0.0"). Composition of codegen'd built-ins:
    * Java's `%.15g` keeps the trailing zeros C strips, so the mantissa is
    * split off, stripped, and re-pointed.
    * Documented limit: doubles that do not round-trip through 15
    * significant digits (e.g. 999999999999999.9) keep the 15-digit form,
    * where real SQLite falls back to a `%!.20e` exact rendering —
    * everything the shipped queries produce (round()ed values,
    * power-of-ten scalings) round-trips and matches bit-for-bit. */
  def sqliteRealString(r: Column): Column = {
    val g = format_string("%.15g", r)
    val hasE = g.contains("e")
    val mant0 = substring_index(g, "e", 1)
    // strip trailing zeros — only meaningful after a decimal point
    // (a 15-integer-digit mantissa like "123456789012340" has none)
    val mant = when(mant0.contains("."), regexp_replace(mant0, "0+$", ""))
      .otherwise(mant0)
    val fixed = when(!mant.contains("."), concat(mant, lit(".0")))
      .when(mant.endsWith("."), concat(mant, lit("0")))
      .otherwise(mant)
    val res = when(hasE, concat(fixed, lit("e"), substring_index(g, "e", -1)))
      .otherwise(fixed)
    when(r === 0.0, lit("0.0")).otherwise(res)
  }

  /** SQLite `quote()` over a variant cell (sqlite.org/lang_corefunc
    * .html#quote): renders the value as an SQL literal — text wrapped in
    * single quotes with embedded quotes doubled, ints as their digits,
    * reals via [[sqliteRealString]] (the `%!.15g` form — NOT Java's
    * cast-to-string, which flips to `1.0E7` scientific at 1e7), NULL as
    * the bare keyword. The read-side counterpart of the reference's
    * statement-text binding (SDF.swift:578-623 binds typed values;
    * quote() is how SQLite shows them back). */
  def quoteVariant(v: Column): Column =
    when(v.getField("t") === "int", v.getField("i").cast(StringType))
      .when(v.getField("t") === "real", sqliteRealString(v.getField("r")))
      .when(v.getField("t") === "text",
        concat(lit("'"),
          regexp_replace(v.getField("s"), lit("'"), lit("''")), lit("'")))
      .otherwise(lit("NULL"))

  /** SQLite `typeof()` over a variant cell: the storage class as text
    * ('integer' | 'real' | 'text' | 'null'; 'blob' lives in binary
    * columns outside the variant, see operators.Multimodal). NULL tag →
    * 'null', matching SQLite's typeof(NULL). */
  def typeofVariant(v: Column): Column =
    when(v.getField("t") === "int", lit("integer"))
      .when(v.getField("t") === "real", lit("real"))
      .when(v.getField("t") === "text", lit("text"))
      .otherwise(lit("null"))
}
