package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** Per-doc term frequencies in ONE native pass: `array<struct<term,cnt>>`
  * with one entry per distinct token of the document.
  *
  * This is the map-side half of every per-(doc, term) aggregation in the
  * text block (t05 TF-IDF's tf frame, t08's corpus vocabulary). The
  * built-in derivation exploded the token stream and shuffled it into a
  * groupBy(doc, term) — but that grouping state never crosses documents,
  * so it fits in a per-row hash map. Fusing it means downstream consumers
  * explode ONE ROW PER DISTINCT TERM PER DOC instead of one row per
  * token, and the per-doc count shuffle disappears entirely; only
  * genuinely corpus-global aggregations (document frequency, corpus
  * vocabulary) still shuffle — over the pre-counted, much smaller frame.
  *
  * Tokenizer contract shared with the t05/t08 oracle SQL and
  * [[RepetitionStats]]: Spark's `lower` (UTF8String.toLowerCase), then
  * tokens are maximal [a-z] runs — exactly
  * `split(trim(regexp_replace(lower(text), "[^a-z]+", " ")), " ")` minus
  * empty tokens. Entries are emitted in first-occurrence order
  * (deterministic per input text); tokenless docs yield an empty array,
  * so an `explode` drops them like the old `filter(term != "")` did.
  */
case class TermCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TermCounts.arrayType
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any =
    TermCounts.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TermCounts$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** The one definition of the shared tokenizer contract ("Spark `lower`,
  * then tokens are maximal [a-z] runs") used by [[TermCounts]] and
  * [[RepetitionStats]] — a single walk both expressions call so the
  * contract cannot drift between them (review finding: the loop was
  * previously duplicated character-for-character in both files). */
private[functions] object AzTokens {
  /** Calls `f(start, end)` for every maximal [a-z] run of the ALREADY
    * LOWERCASED string `s` (callers lowercase via UTF8String.toLowerCase
    * to match Spark's `lower` exactly). */
  @inline def foreachRun(s: String)(f: (Int, Int) => Unit): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'a' && c <= 'z') {
        val start = i
        while (i < n && { val d = s.charAt(i); d >= 'a' && d <= 'z' }) i += 1
        f(start, i)
      } else i += 1
    }
  }
}

object TermCounts {
  val structType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false)))
  val arrayType: ArrayType = ArrayType(structType, containsNull = false)

  def eval(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val counts = new java.util.LinkedHashMap[String, Long](64)
    AzTokens.foreachRun(s) { (start, end) =>
      counts.merge(s.substring(start, end), 1L, (a, b) => a + b)
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      p += 1
    }
    new GenericArrayData(out)
  }

  def termCounts(text: Column): Column =
    glue.toColumn(TermCounts(glue.toExpression(text)))
}
