package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.types.{SQLiteCodec, SQLiteType}

/** Write-path fidelity artifact (S6/S7/C6 — the reference's core,
  * SDF.swift:721-776): everything the repo's SQLite write surface
  * GENERATES, dumped for true-reference replay.
  *
  *  - CREATE TABLE DDL from [[SQLiteType.declFor]] +
  *    [[SQLiteIO.SQLiteDialect.quoteIdentifier]] (unknown types become
  *    bare columns = NONE affinity, SDF.swift:761-767)
  *  - INSERT parameter binds produced by the [[SQLiteCodec]] encode
  *    chain: bool→0/1 int (C1), timestamp→"yyyy-MM-dd HH:mm:ss" text
  *    (SDF.swift:741-745), uint64→digit text that INT affinity folds
  *    back to integer storage when it fits int64 and keeps as text above
  *    (C3, SDF.swift:617-623), unknown types→string rendering (C6
  *    fallback); the NULL check precedes encode, mirroring the
  *    reference's bind loop (SDF.swift:575-585)
  *  - the PREDICTED post-affinity storage class and text rendering per
  *    cell (reals via the %!.15g contract of
  *    `SQLiteExprs.sqliteRealString`)
  *  - the SDF.swift:578 lenient-arity case: a 3-column frame bound to a
  *    2-parameter statement truncates to the statement's width
  *
  * `scripts/sqlite_fidelity.py` replays DDL + binds through REAL SQLite
  * (python sqlite3) and diffs typeof() / CAST(… AS TEXT) / hex()
  * cell-for-cell against the predictions — closing the loop the absent
  * sqlite-jdbc driver leaves open for S6/S7.
  */
object WritePathDump {

  /** SQLite's REAL→TEXT rendering (%!.15g), host-side twin of the
    * `SQLiteExprs.sqliteRealString` expression (same documented
    * 15-digit-round-trip limit); the fidelity replay cross-checks both
    * against real SQLite. */
  def sqliteRealText(d: Double): String =
    if (d == 0.0) "0.0"
    else {
      val g = String.format(java.util.Locale.US, "%.15g", Double.box(d))
      val (mant0, expPart) = g.indexOf('e') match {
        case -1 => (g, "")
        case i  => (g.substring(0, i), g.substring(i))
      }
      val mant1 =
        if (mant0.contains(".")) mant0.reverse.dropWhile(_ == '0').reverse
        else mant0
      val mant =
        if (!mant1.contains(".")) mant1 + ".0"
        else if (mant1.endsWith(".")) mant1 + "0"
        else mant1
      mant + expPart
    }

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def hexUpper(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02X").mkString

  /** JSON cell for a bound storage value. */
  private def cellJson(v: Any): String = v match {
    case null            => "null"
    case l: Long         => s"""{"i":$l}"""
    case d: Double       => s"""{"r":${java.lang.Double.toString(d)}}"""
    case s: String       => s"""{"s":${esc(s)}}"""
    case b: Array[Byte]  => s"""{"b":${esc(b.map(x => f"${x & 0xff}%02x").mkString)}}"""
    case other => throw new IllegalStateException(s"unexpected cell $other")
  }

  /** Real SQLite's affinity for our generated decls (sqlite.org/datatype3
    * §3.1): INT→INTEGER, TEXT→TEXT, BLOB→BLOB, DOUBLE/FLOAT→REAL,
    * BOOLEAN/DATE (no keyword match)→NUMERIC, bare→NONE. */
  private def affinity(decl: Option[String]): String = decl match {
    case None => "NONE"
    case Some(d) =>
      val t = d.toUpperCase
      if (t.contains("INT")) "INTEGER"
      else if (t.contains("CHAR") || t.contains("CLOB") || t.contains("TEXT")) "TEXT"
      else if (t.contains("BLOB")) "BLOB"
      else if (t.contains("REAL") || t.contains("FLOA") || t.contains("DOUB")) "REAL"
      else "NUMERIC"
  }

  private val intLitRe = "^[+-]?\\d+$".r

  /** Predicted (typeof, rendering) after real SQLite stores `v` in a
    * column of the given affinity. Covers exactly the storage/affinity
    * combinations the codec chain produces. Notable true-SQLite rule
    * (sqlite.org/datatype3 §3.4, verified by the replay): a well-formed
    * integer literal too large for int64 under INTEGER/NUMERIC affinity
    * is stored as REAL — so the reference's bind-UInt64-as-text escape
    * (SDF.swift:617-623) still loses precision when the target column
    * was declared INT by its own DDL; only a TEXT/NONE-affinity column
    * preserves the digits. The C3 read chain's Decimal(20,0) parse is
    * exact whenever the digits survive, best-effort after this REAL
    * conversion — faithfully matching the reference + SQLite stack. */
  private def predict(aff: String, v: Any): (String, String) = v match {
    case null => ("null", "")
    case l: Long => ("integer", l.toString)
    case d: Double => ("real", sqliteRealText(d))
    case b: Array[Byte] => ("blob", hexUpper(b))
    case s: String =>
      val numericAff = aff == "INTEGER" || aff == "NUMERIC"
      if (numericAff && intLitRe.matches(s))
        scala.util.Try(s.toLong) match {
          case scala.util.Success(l) => ("integer", l.toString)
          case _ => ("real", sqliteRealText(s.toDouble))
        }
      else ("text", s)
  }

  /** The logical frame: one column per write-surface type, rows covering
    * sign/limit/empty/unicode/null edges. */
  private def logicalFrame(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("bo", BooleanType), StructField("iv", LongType),
      StructField("rv", DoubleType), StructField("sv", StringType),
      StructField("bv", BinaryType), StructField("dv", TimestampType),
      StructField("uv", DecimalType(20, 0)),
      StructField("any col", ArrayType(IntegerType))))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def dec(s: String) = new java.math.BigDecimal(s)
    val rows = Seq(
      Row(true, 0L, 12.25, "it's", Array[Byte](0, -1, 16),
        ts("2024-02-29 12:34:56"), dec("42"), Seq(1, 2)),
      Row(false, Long.MaxValue, -42.5, "", Array.empty[Byte],
        null, dec("18446744073709551615"), null),
      Row(null, Long.MinValue, null, "héllo 世界", null,
        ts("1970-01-01 00:00:00"), null, Seq(7)),
      Row(true, -1L, 0.0, "line1\nline2", Array[Byte](127),
        ts("2033-05-18 03:33:20"), dec("9223372036854775807"), Seq.empty[Int]))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  def dump(spark: SparkSession, outDir: String): Unit = {
    val df = logicalFrame(spark)
    val table = "graft_wp"
    // DDL exactly as the dialect/affinity layer generates it
    val decls = df.schema.fields.map(f => f.name -> SQLiteType.declFor(f.dataType))
    val colDefs = decls.map { case (n, d) =>
      SQLiteIO.SQLiteDialect.quoteIdentifier(n) + d.map(" " + _).getOrElse("")
    }
    val ddl = s"CREATE TABLE $table (${colDefs.mkString(", ")})"
    val insert =
      s"INSERT INTO $table VALUES (${Seq.fill(decls.length)("?").mkString(",")})"
    // storage cells via the codec encode chain (null check FIRST, like
    // the reference's bind loop)
    def nn(c: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
      when(c.isNull, lit(null)).otherwise(e)
    val enc = df.select(
      nn(col("bo"), SQLiteCodec.boolCodec.encode(col("bo"))).as("bo"),
      col("iv"),
      col("rv"),
      col("sv"),
      col("bv"),
      nn(col("dv"), SQLiteCodec.timestampCodec.encode(col("dv"))).as("dv"),
      nn(col("uv"), SQLiteCodec.uint64Codec.encode(col("uv"))).as("uv"),
      nn(col("any col"), col("any col").cast(StringType)).as("any col"))
    val cells: Seq[Seq[Any]] = enc.collect().toSeq.map(r =>
      (0 until r.length).map(i => if (r.isNullAt(i)) null else r.get(i)))
    val affs = decls.map { case (_, d) => affinity(d) }
    val rowsJson = cells.map(r => r.map(cellJson).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val expJson = cells.map { r =>
      r.zip(affs).map { case (v, a) =>
        val (t, txt) = predict(a, v)
        s"[${esc(t)},${esc(txt)}]"
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]")
    val colsJson = decls.map(d => esc(d._1)).mkString("[", ",", "]")
    // lenient-arity truncation (SDF.swift:578): 3-wide frame, 2-param
    // statement — StatementSink binds min(paramCount, width) columns
    val truncDdl =
      """CREATE TABLE graft_wp_trunc ("a" INT, "b" TEXT)"""
    val truncInsert = "INSERT INTO graft_wp_trunc (\"a\", \"b\") VALUES (?,?)"
    val truncRows =
      """[[{"i":1},{"s":"x"},{"i":99}],[{"i":2},{"s":"y"},{"i":98}]]"""
    val truncExpect = """[["1","x"],["2","y"]]"""
    val json =
      s"""{"table":${esc(table)},"ddl":${esc(ddl)},"insert":${esc(insert)},
         |"cols":$colsJson,"rows":$rowsJson,"expected":$expJson,
         |"trunc":{"ddl":${esc(truncDdl)},"insert":${esc(truncInsert)},
         |"bind_width":2,"rows":$truncRows,"expect":$truncExpect}}""".stripMargin
    Files.writeString(Paths.get(s"$outDir/writepath.json"), json)
  }
}
