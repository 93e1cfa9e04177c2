package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.TimestampFormatter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** C4 (SDF.swift:491-511) fused: SQLite's tri-representation date decode
  * in ONE pass over the cell bytes.
  *
  * The composed form (`SQLiteExprs.dateTriFromString`) classifies each
  * cell with two `rlike` regex matches before dispatching to
  * timestamp_seconds / julian arithmetic / try_to_timestamp — ~4 regex
  * machines per row on the read path of every date column. This
  * expression walks the bytes once (digits-only → epoch seconds;
  * digits with '.'/exponent → Julian day; anything else → strict
  * "yyyy-MM-dd HH:mm:ss" parse via Spark's own TimestampFormatter, so
  * text parsing is bit-identical to try_to_timestamp) and returns
  * micros or NULL. Semantics differentially pinned against the composed
  * form in SQLiteExprsSpec.
  *
  * TimeZoneAware like every Spark timestamp parser: the analyzer
  * resolves the session zone into `timeZoneId` (UTC in every shipped
  * entry point), and the Julian/epoch arms are zone-free by definition.
  */
case class DateTriDecode(child: Expression,
    timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def prettyName: String = "date_tri_decode"

  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(tz))

  @transient private lazy val formatter: TimestampFormatter =
    TimestampFormatter("yyyy-MM-dd HH:mm:ss", zoneId, isParsing = true)

  override protected def nullSafeEval(input: Any): Any =
    DateTriDecode.decode(input.asInstanceOf[UTF8String], formatter)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fmt = ctx.addReferenceObj("triFormatter", formatter,
      classOf[TimestampFormatter].getName)
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("tri")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        java.lang.Long $boxed =
          graft.functions.DateTriDecode$$.MODULE$$.decode(${childGen.value}, $fmt);
        if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DateTriDecode =
    copy(child = newChild)
}

object DateTriDecode {
  private val JulianUnixEpoch = 2440587.5
  private val SecondsPerDay = 86400.0

  /** One-pass shape classifier + decode. Returns epoch MICROS, or null
    * when the cell parses under none of the three representations —
    * exactly the classification of the composed form's regexes:
    * `^-?\d+$` (epoch seconds), `^-?\d+\.\d+([eE][+-]?\d+)?$` (Julian
    * day), else the strict text format. */
  def decode(s: UTF8String, fmt: TimestampFormatter): java.lang.Long = {
    val b = s.getBytes
    val n = b.length
    // classify: 0 = int, 1 = real, -1 = neither
    var shape = -1
    if (n > 0) {
      var i = if (b(0) == '-') 1 else 0
      val digitsStart = i
      var dot = -1
      var expAt = -1
      var valid = i < n
      var continue = valid
      while (continue && i < n) {
        val c = b(i)
        if (c >= '0' && c <= '9') ()
        else if (c == '.' && dot < 0 && expAt < 0) dot = i
        else if ((c == 'e' || c == 'E') && dot >= 0 && expAt < 0 && i > dot + 1) {
          expAt = i
          // optional sign directly after exponent
          if (i + 1 < n && (b(i + 1) == '+' || b(i + 1) == '-')) i += 1
          if (i + 1 >= n) valid = false // exponent needs at least one digit
        } else { valid = false; continue = false }
        i += 1
      }
      if (valid && i == n && digitsStart < n && b(digitsStart) != '.') {
        if (dot < 0 && expAt < 0) shape = 0
        else if (dot >= 0 && dot > digitsStart && dot < n - 1 &&
                 (expAt < 0 || expAt > dot + 1)) shape = 1
      }
    }
    shape match {
      case 0 =>
        // out-of-range epochs (parse or ×1e6 overflow) → NULL; the
        // composed form would throw under ANSI — unreachable for any
        // real date, and NULL is the SQLite-faithful no-date answer
        try java.lang.Long.valueOf(
          Math.multiplyExact(java.lang.Long.parseLong(s.toString), 1000000L))
        catch {
          case _: NumberFormatException => null
          case _: ArithmeticException => null
        }
      case 1 =>
        val d = java.lang.Double.parseDouble(s.toString)
        val seconds = (d - JulianUnixEpoch) * SecondsPerDay
        // identical to timestamp_seconds(double): micros = (s * 1e6).toLong
        if (seconds.isNaN || seconds.isInfinite) null
        else java.lang.Long.valueOf((seconds * 1000000L.toDouble).toLong)
      case _ =>
        try java.lang.Long.valueOf(fmt.parse(s.toString))
        catch { case _: Exception => null }
    }
  }

  /** Column-level entry point. */
  def dateTri(cell: Column): Column =
    glue.toColumn(DateTriDecode(glue.toExpression(cell)))
}
