package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.glue

/** Random-hyperplane signature for cosine LSH, packed into one long
  * (≤ 64 planes): bit j = sign of ⟨v, r_j⟩ with r_j a seeded Gaussian
  * hyperplane. One fused pass over the vector — the composed-expression
  * form (planes × dim element_at multiplies) builds a 1000+-node tree
  * that blows past codegen limits and gets re-evaluated on every join
  * branch. Plane constants are deterministic from (dim, planes, seed):
  * identical on every executor, nothing shipped. */
case class HyperplaneSig(child: Expression, dim: Int, planes: Int, seed: Long)
    extends UnaryExpression {
  require(planes <= 64, "signature packs into one long")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // element-width-adaptive like VecDotF32: bind to the file's physical
  // encoding (float[] or double[]) instead of forcing a float cast that
  // would quietly downcast a double[] corpus
  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // any other element type (an int8/int32-quantized embedding, say) must
  // fail analysis, not be bit-reinterpreted by getFloat
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.eval(input.asInstanceOf[ArrayData],
      HyperplaneSig.planesFor(dim, planes, seed), elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hplanes",
      HyperplaneSig.planesFor(dim, planes, seed), "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSig$$.MODULE$$.eval($c, $ref, $elemIsDouble)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Array[Double]]]

  def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] =
    cache.computeIfAbsent((dim, planes, seed), { _ =>
      val rnd = new scala.util.Random(seed)
      Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    })

  def eval(vec: ArrayData, planes: Array[Array[Double]], elemIsDouble: Boolean): Long = {
    var sig = 0L
    val n = vec.numElements()
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val d = math.min(n, p.length)
      var acc = 0.0
      var i = 0
      while (i < d) {
        val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
        acc += x * p(i); i += 1
      }
      if (acc >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  def sig(vec: Column, dim: Int, planes: Int, seed: Long = 7L): Column =
    glue.toColumn(HyperplaneSig(glue.toExpression(vec), dim, planes, seed))
}
