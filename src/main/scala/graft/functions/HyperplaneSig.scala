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

/** Banded random-hyperplane signature: array<long> of length `bands`,
  * element b = the `rowsPerBand` sign bits of band b's OWN hyperplanes
  * (plane indexes b·rowsPerBand … b·rowsPerBand+rowsPerBand−1) packed
  * into one long. Lifts [[HyperplaneSig]]'s one-long cap: bands and
  * rowsPerBand no longer share a 63-bit budget, so the band count can
  * grow with the corpus (the recall lever — see
  * `Dedup.hyperplaneLshParamsFor`) while each band's bucket width grows
  * too (the occupancy/cost lever). Bit layout is compatible: at the same
  * (dim, bands·rowsPerBand, seed), element b equals
  * `(HyperplaneSig >> b·rowsPerBand) & ((1<<rowsPerBand)−1)`
  * (spec-pinned in SimilaritySpec). One fused pass over the vector, same
  * element-width adaptivity as [[HyperplaneSig]]. */
case class HyperplaneBandBuckets(child: Expression, dim: Int, bands: Int,
    rowsPerBand: Int, seed: Long) extends UnaryExpression {
  require(bands >= 1, s"bands must be positive: $bands")
  require(rowsPerBand >= 1 && rowsPerBand <= 62,
    s"rowsPerBand must fit one signed long bucket (1..62): $rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_buckets"

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float> or array<double> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.evalBands(input.asInstanceOf[ArrayData],
      HyperplaneSig.planesFor(dim, bands * rowsPerBand, seed), rowsPerBand,
      elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hplanes",
      HyperplaneSig.planesFor(dim, bands * rowsPerBand, seed), "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSig$$.MODULE$$.evalBands($c, $ref, $rowsPerBand, $elemIsDouble)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandBuckets =
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

  /** [[HyperplaneBandBuckets]] eval: planes.length = bands·rowsPerBand;
    * band b packs sign bits of planes b·rowsPerBand+j at bit j. */
  def evalBands(vec: ArrayData, planes: Array[Array[Double]],
      rowsPerBand: Int, elemIsDouble: Boolean): ArrayData = {
    val bands = planes.length / rowsPerBand
    val out = new Array[Long](bands)
    val n = vec.numElements()
    var b = 0
    var idx = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = planes(idx)
        val d = math.min(n, p.length)
        var acc = 0.0
        var i = 0
        while (i < d) {
          val x = if (elemIsDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
          acc += x * p(i); i += 1
        }
        if (acc >= 0) sig |= (1L << j)
        j += 1; idx += 1
      }
      out(b) = sig
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def sig(vec: Column, dim: Int, planes: Int, seed: Long = 7L): Column =
    glue.toColumn(HyperplaneSig(glue.toExpression(vec), dim, planes, seed))

  def bandBuckets(vec: Column, dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long = 7L): Column =
    glue.toColumn(HyperplaneBandBuckets(glue.toExpression(vec), dim, bands,
      rowsPerBand, seed))
}
