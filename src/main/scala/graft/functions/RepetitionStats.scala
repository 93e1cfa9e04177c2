package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** Per-doc repetition counters in ONE native pass — the inputs of the
  * Gopher-style quality signals (t07; reference surface: the quality
  * filters a training-data pipeline runs over every document).
  *
  * The previous derivation tokenized with built-in columns, exploded the
  * token stream, and ran TWO map-side-combined shuffles (per-(doc,term)
  * and per-(doc,bigram) counts) plus a join back on the doc id. All of
  * that traffic only ever re-aggregated rows that came from a single
  * document — state that fits in a per-row hash map. This expression
  * computes the same five counters in one walk over the lowercased text,
  * so the operator becomes a narrow map: zero shuffles, zero persisted
  * intermediates, and the token stream (the largest intermediate in the
  * whole text block at 100 TB) never exists as rows at all.
  *
  * Output is a 0-or-1-element array consumed via `explode`, which (a)
  * drops empty/tokenless docs exactly like the old explode-based
  * pipeline did, and (b) evaluates the expression ONCE per row inside
  * GenerateExec — a plain `filter(n_words > 0)` would be pushed below
  * the project by Catalyst and re-evaluate the whole pass per row.
  *
  * Only exact integer counters are produced; the ratio/rounding
  * arithmetic stays in Column land (same `round`/`cast` calls as the old
  * derivation) so results are bit-identical to the previous operator and
  * to the DuckDB oracle.
  *
  * Tokenizer contract (shared with the t07 oracle SQL): lowercase with
  * Spark's own `lower` semantics (UTF8String.toLowerCase), then tokens
  * are maximal runs of [a-z] — every other character is a separator,
  * exactly `split(trim(regexp_replace(lower(text), "[^a-z]+", " ")), " ")`.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.arrayType
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val structType: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_len", LongType, nullable = false),     // Σ token length over ALL tokens
    StructField("top_cnt", LongType, nullable = false),     // count of the most frequent token
    StructField("n_bigrams", LongType, nullable = false),   // n_words - 1
    StructField("dup_bigrams", LongType, nullable = false)) // n_bigrams - distinct bigrams
  )
  val arrayType: ArrayType = ArrayType(structType, containsNull = false)

  private val empty = new GenericArrayData(Array.empty[Any])

  def eval(text: UTF8String): ArrayData = {
    // Spark's `lower()` is UTF8String.toLowerCase under the default
    // collation — using the same call keeps any non-ASCII lowercasing
    // (e.g. U+0130) identical to the old column derivation. The token
    // walk itself is the shared AzTokens contract (one definition for
    // this expression and TermCounts).
    val s = text.toLowerCase.toString
    var nWords = 0L
    var sumLen = 0L
    var topCnt = 0L
    var prev: String = null
    var dupBigrams = 0L
    val termCnt = new java.util.HashMap[String, Long](64)
    val seenBg = new java.util.HashSet[String](64)
    val bg = new java.lang.StringBuilder(48)
    AzTokens.foreachRun(s) { (start, end) =>
      val tok = s.substring(start, end)
      nWords += 1
      sumLen += tok.length
      val cnt = termCnt.merge(tok, 1L, (a, b) => a + b)
      if (cnt > topCnt) topCnt = cnt
      if (prev != null) {
        bg.setLength(0)
        bg.append(prev).append(' ').append(tok)
        if (!seenBg.add(bg.toString)) dupBigrams += 1
      }
      prev = tok
    }
    if (nWords == 0L) empty
    else new GenericArrayData(Array[Any](new GenericInternalRow(
      Array[Any](nWords, sumLen, topCnt, nWords - 1L, dupBigrams))))
  }

  def repetitionStats(text: Column): Column =
    glue.toColumn(RepetitionStats(glue.toExpression(text)))
}
