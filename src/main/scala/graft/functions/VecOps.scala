package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.glue

/** Native float/double-vector dot product.
  *
  * `zip_with + aggregate` builds an intermediate array per row-pair — at
  * 12.5M candidate pairs that allocation dominates the whole near-dup
  * join. This fused expression is one tight primitive loop (element reads,
  * double accumulate), codegen'd via a static call, no allocation.
  *
  * Element-type-adaptive: accepts `array<float>` and `array<double>` on
  * either side independently, always accumulating in double. The corpus
  * has shipped under shifting physical encodings before (the events `ts`
  * incident — Tables.normalizeTs); if `embeddings.embedding` arrives as
  * double[] instead of float[], a blanket float cast would LOSE precision
  * and break round-to-6 oracle hash matches, so the expression binds to
  * whatever element width the file actually carries — float elements are
  * widened exactly, double elements read natively, matching what the
  * DuckDB oracle's `CAST(embedding AS DOUBLE[])` computes in both cases.
  */
case class VecDotF32(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDotF32.eval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isDoubleArr(left), isDoubleArr(right))

  // the element-width flags are compile-time constants in the generated
  // source, so JIT specializes the loop per call site — no per-element
  // branch cost survives
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecDotF32$$.MODULE$$.eval($a, $b, ${isDoubleArr(left)}, ${isDoubleArr(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotF32 =
    copy(left = l, right = r)
}

object VecDotF32 {
  def eval(a: ArrayData, b: ArrayData, aIsDouble: Boolean, bIsDouble: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  /** dot(u,v) over array<float> / array<double> columns (no coercion —
    * the expression binds to the physical element width). */
  def dot(u: Column, v: Column): Column =
    glue.toColumn(VecDotF32(glue.toExpression(u), glue.toExpression(v)))

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(u: Column, v: Column): Column = dot(u, v) / (norm(u) * norm(v))
}
