package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._
import graft.types.SQLiteType

/** S1–S9: the reference's source/sink surface (SURVEY.md §2.1) as a Spark
  * JDBC dialect + reader/writer API.
  *
  * The reference (SDF.swift:248-304, 721-776) reads a table or arbitrary
  * SQL into an eager frame and writes frames back with a table-creation
  * policy. Spark-first shape: `spark.read.jdbc` with a registered
  * `JdbcDialect` carrying the affinity rules, `df.write.jdbc` with the
  * policy→SaveMode mapping. The dialect + SQL generation are pure and
  * unit-tested; live-connection paths need a sqlite-jdbc driver on the
  * cluster classpath (not present in this container — see spec).
  */
object SQLiteIO {

  /** IfTableExistsPolicy (SDF.swift:197-206) ↔ SaveMode (S7). */
  sealed trait IfExists { def saveMode: SaveMode }
  object IfExists {
    case object Fail      extends IfExists { val saveMode = SaveMode.ErrorIfExists }
    case object DoNothing extends IfExists { val saveMode = SaveMode.Ignore }
    case object Replace   extends IfExists { val saveMode = SaveMode.Overwrite }
    case object Append    extends IfExists { val saveMode = SaveMode.Append }
  }

  /** Affinity-aware dialect: read-side decltype → Catalyst type
    * (SDF.swift:161-194), write-side Spark type → SQLite decl
    * (SDF.swift:741-771). */
  object SQLiteDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase.startsWith("jdbc:sqlite")

    override def getCatalystType(
        sqlType: Int, typeName: String, size: Int,
        md: MetadataBuilder): Option[DataType] =
      Option(typeName).filter(_.nonEmpty)
        .map(t => SQLiteType.fromDeclared(t).sparkType)

    override def getJDBCType(dt: DataType): Option[JdbcType] =
      SQLiteType.declFor(dt).map { decl =>
        JdbcType(decl, dt match {
          case StringType  => java.sql.Types.VARCHAR
          case BooleanType => java.sql.Types.BOOLEAN
          case FloatType | DoubleType => java.sql.Types.DOUBLE
          case TimestampType | DateType => java.sql.Types.TIMESTAMP
          case BinaryType  => java.sql.Types.BLOB
          case _           => java.sql.Types.BIGINT
        })
      }

    override def quoteIdentifier(colName: String): String =
      "\"" + colName.replace("\"", "\"\"") + "\""
  }

  def registerDialect(): Unit = JdbcDialects.registerDialect(SQLiteDialect)

  /** S1 SQL generation (SDF.swift:250-251): projection pushed into the
    * SELECT by construction. Pure — unit tested. */
  def tableScanSql(table: String, columns: Seq[String] = Nil): String = {
    val cols = if (columns.isEmpty) "*" else columns.mkString(", ")
    s"SELECT $cols FROM $table"
  }

  /** `customSchema` string honoring user type overrides (the reference's
    * `types:` dict, SDF.swift:364-374). */
  def customSchema(overrides: Map[String, SQLiteType]): String =
    overrides.map { case (n, t) => s"$n ${t.sparkType.simpleString}" }.mkString(", ")

  /** S1/S2: read a table or arbitrary SQL through JDBC. */
  def read(
      spark: SparkSession, url: String,
      table: Option[String] = None, query: Option[String] = None,
      columns: Seq[String] = Nil,
      typeOverrides: Map[String, SQLiteType] = Map.empty): DataFrame = {
    registerDialect()
    val r0 = spark.read.format("jdbc").option("url", url)
    val r1 = (table, query) match {
      case (Some(t), _) => r0.option("dbtable", s"(${tableScanSql(t, columns)}) q")
      case (_, Some(q)) => r0.option("query", q)
      case _ => throw new IllegalArgumentException("table or query required")
    }
    val r2 = if (typeOverrides.nonEmpty)
      r1.option("customSchema", customSchema(typeOverrides)) else r1
    r2.load()
  }

  /** S3 (SDF.swift:346-397): prepared-statement scan. The reference's
    * third entry point is `DataFrame(statement:)` — a prepared handle
    * with already-bound parameters, column types from the statement's
    * decltypes. JDBC hides statement handles from Spark's planner, so
    * the Spark-shape analogue is (sql-with-?, params) → positional
    * literal substitution → the S2 scan path; affinity/type-override
    * resolution is identical to S2.
    *
    * Literal rendering follows the reference's bind classes
    * (SDF.swift:741-771): Boolean→1/0 (bind_int), integrals→digits
    * (bind_int64), floating→shortest round-trip decimal (bind_double is
    * exact; the shortest decimal re-parses to the identical double),
    * String→'…' with '' doubling, Array[Byte]→X'hex' (bind_blob),
    * java.sql.Timestamp/Date→typed TIMESTAMP/DATE literals carrying the
    * reference's "yyyy-MM-dd HH:mm:ss" text form, BigDecimal→plain
    * digits (the UInt64 escape, SDF.swift:617-623), null→NULL. Float
    * widens to Double BEFORE rendering (bind_double(Double(f)),
    * SDF.swift:752) — 0.1f binds as 0.10000000149011612, not 0.1, since
    * Spark SQL re-parses every decimal literal as a double.
    * `?` is a placeholder only where sqlite3_prepare would tokenize one:
    * the substitution walks the SQL skipping '…' strings, "…"/`…`/[…]
    * quoted identifiers (with doubled-char escapes), `--` line comments
    * and `／* *／` block comments (a `?` inside any of those is passed
    * through verbatim and does not consume a parameter). Arity is
    * strict, like [[StatementSink.writeStatement]]. */
  def bindParameters(sql: String, params: Seq[Any]): String = {
    def lit(p: Any): String = p match {
      case null                => "NULL"
      case None                => "NULL"
      case Some(x)             => lit(x)
      case b: Boolean          => if (b) "1" else "0"
      case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
      case f: Float            => java.lang.Double.toString(f.toDouble)
      case d: Double           => java.lang.Double.toString(d)
      case d: java.math.BigDecimal => d.toPlainString
      case d: BigDecimal       => d.bigDecimal.toPlainString
      case s: String           => "'" + s.replace("'", "''") + "'"
      case b: Array[Byte]      => "X'" + b.map(x => f"${x & 0xff}%02x").mkString + "'"
      case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString.stripSuffix(".0")}'"
      case d: java.sql.Date    => s"DATE '$d'"
      case other => throw new IllegalArgumentException(
        s"unbindable parameter type ${other.getClass.getName}")
    }
    val out = new StringBuilder
    var next = 0
    var i = 0
    val n = sql.length
    while (i < n) {
      sql.charAt(i) match {
        // '…' / "…" / `…` run to the matching close; a doubled close
        // char is an escape and stays inside (sqlite3 tokenizer rules)
        case q @ ('\'' | '"' | '`') =>
          out += q; i += 1
          var closed = false
          while (i < n && !closed) {
            val c = sql.charAt(i); out += c; i += 1
            if (c == q) {
              if (i < n && sql.charAt(i) == q) { out += q; i += 1 }
              else closed = true
            }
          }
        // [bracket] identifiers: no escape, runs to the first ']'
        case '[' =>
          out += '['; i += 1
          while (i < n && sql.charAt(i) != ']') { out += sql.charAt(i); i += 1 }
          if (i < n) { out += ']'; i += 1 }
        // -- line comment: to end of line (or end of statement)
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') { out += sql.charAt(i); i += 1 }
        // /* block comment: to */ or, like sqlite3, end of statement
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          out ++= "/*"; i += 2
          while (i < n && !(sql.charAt(i) == '*' && i + 1 < n && sql.charAt(i + 1) == '/')) {
            out += sql.charAt(i); i += 1
          }
          if (i < n) { out ++= "*/"; i += 2 }
        case '?' =>
          if (next >= params.length) throw new IllegalArgumentException(
            s"statement has more than ${params.length} parameters")
          out ++= lit(params(next)); next += 1; i += 1
        case c => out += c; i += 1
      }
    }
    if (next != params.length) throw new IllegalArgumentException(
      s"statement has $next parameters but ${params.length} values were bound")
    out.toString
  }

  /** S3: run a parameterized statement against the session catalog
    * (registered views / tables) — `prepare` + bind + read in one step. */
  def preparedScan(spark: SparkSession, sql: String, params: Seq[Any]): DataFrame =
    spark.sql(bindParameters(sql, params))

  /** Eager-compat read (SURVEY.md §7.4 hard part 2): the reference fully
    * materializes at init, so later table mutations don't affect an
    * already-read frame. Spark frames are lazy views — opt into snapshot
    * semantics by caching and forcing materialization here. */
  def snapshot(df: DataFrame): DataFrame = {
    val cached = df.cache()
    cached.count()
    cached
  }

  /** S9: batch-SQL passthrough (≈ SQLiteConnection.exec, SDF.swift:52-54):
    * run semicolon-separated statements through Spark SQL (DDL/DML on the
    * session catalog; fixtures, view definitions, CTAS). */
  def exec(spark: SparkSession, sql: String): Unit =
    sql.split(";").map(_.trim).filter(_.nonEmpty).foreach(spark.sql(_).collect())

  /** S7: table sink with creation policy. */
  def write(df: DataFrame, url: String, table: String, ifExists: IfExists): Unit = {
    registerDialect()
    df.write.mode(ifExists.saveMode).format("jdbc")
      .option("url", url).option("dbtable", table).save()
  }
}
