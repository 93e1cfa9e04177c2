package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lit, sqrt}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.glue

/** Native float-vector dot product.
  *
  * `zip_with + aggregate` builds an intermediate array per row-pair — at
  * 12.5M candidate pairs that allocation dominates the whole near-dup
  * join. This fused expression is one tight primitive loop (float reads,
  * double accumulate), codegen'd via a static call, no allocation.
  */
case class VecDotF32(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecDotF32.eval(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDotF32$$.MODULE$$.eval($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotF32 =
    copy(left = l, right = r)
}

object VecDotF32 {
  def eval(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  private def asF32(c: Column): Column = c.cast(ArrayType(FloatType))

  /** dot(u,v) with both sides coerced to array<float>. */
  def dot(u: Column, v: Column): Column =
    glue.toColumn(VecDotF32(glue.toExpression(asF32(u)), glue.toExpression(asF32(v))))

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(u: Column, v: Column): Column = dot(u, v) / (norm(u) * norm(v))
}
