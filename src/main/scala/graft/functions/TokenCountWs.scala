package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** Whitespace token count, fused: one byte walk, zero allocation.
  *
  * Replicates `when(length(trim(text)) === 0, 0).otherwise(
  * size(split(trim(text), "\\s+")))` EXACTLY, quirks included:
  *   - `trim` strips ASCII SPACE (0x20) only, so a trimmed form that
  *     STARTS or ENDS with other whitespace (\t, \n…) gains a phantom
  *     empty field on that side — Spark's `split` uses limit = -1, which
  *     KEEPS trailing empties (unlike Java's default) — counted as +1
  *     each; an all-space string counts 0 via the length guard
  *   - whitespace is Java regex `\s` = [ \t\n\x0B\f\r] — all ASCII, so
  *     multi-byte UTF-8 sequences can never be separators and the walk
  *     stays on raw bytes
  * The composed form (in TextOps) is kept as this expression's
  * differential oracle; the five token-counting pipelines (t01/t02/t09/
  * t10/p01) all route through this single pass instead of a per-row
  * regex split that materializes the token array just to take its size.
  */
case class TokenCountWs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count_ws"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountWs.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCountWs$$.MODULE$$.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountWs =
    copy(child = newChild)
}

object TokenCountWs {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def count(s: UTF8String): Int = {
    val b = s.getBytes
    // space-only trim bounds (what Spark's trim() removes)
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == ' ') lo += 1
    while (hi > lo && b(hi - 1) == ' ') hi -= 1
    if (lo == hi) return 0 // empty after trim → guarded 0
    var runs = 0
    var inRun = false
    var i = lo
    while (i < hi) {
      if (isWs(b(i))) inRun = false
      else if (!inRun) { runs += 1; inRun = true }
      i += 1
    }
    // phantom empty fields where the trimmed string starts/ends with
    // non-space whitespace (split keeps leading AND, at limit -1,
    // trailing empties)
    runs + (if (isWs(b(lo))) 1 else 0) + (if (isWs(b(hi - 1))) 1 else 0)
  }

  /** Column-level entry point. */
  def tokenCountWs(text: Column): Column =
    glue.toColumn(TokenCountWs(glue.toExpression(text)))
}
