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

/** Narrow-map argmax over a LITERAL centroid matrix: for one corpus
  * vector, the (cid, cosine) of the best of K centroids — the k-means
  * assignment step as a single codegen'd expression instead of a
  * crossJoin(broadcast) × groupBy(id).max_by aggregation (r17 verdict #3:
  * that shape exchanges one pre-reduced row PER CORPUS ROW per Lloyd
  * iteration; this one exchanges nothing).
  *
  * The "codegen blowup at sized nCells" risk the r17 hand-off names is
  * avoided by construction: the centroid matrix is ONE literal object
  * reference in the generated source (never unrolled), and the loop over
  * K lives in this static method, so generated-code size is O(1) in K.
  *
  * Bit-exactness with the max_by shape (what s02's recorded metrics pin):
  *   - per-candidate cosine = dot(u,c) / (sqrt(dot(u,u)) * sqrt(dot(c,c)))
  *     with the same left-to-right accumulation [[VecDotF32.eval]] does
  *     and the same operand order [[VecDotF32.cosine]] builds;
  *   - winner = lexicographic max of (cos, -cid), i.e. highest cosine,
  *     ties to the LOWEST cid, via the same SQL double ordering
  *     (SQLOrderingUtil — NaN greatest, NaN == NaN) max_by compares with.
  * Null vectors return a null struct (BinaryExpression null intolerance);
  * every caller feeds non-null vectors (kmeansFit collects init centroids
  * with `.as[Array[Double]]`, which already requires them).
  *
  * `roundScale` ≥ 0 rounds each candidate cosine (HALF_UP at that scale,
  * the exact arithmetic of Spark's `round(col, n)` on doubles:
  * BigDecimal.valueOf + setScale, NaN/Infinity passed through) BEFORE
  * the argmax — the [[graft.operators.Similarity.assignCells]] contract,
  * where pre-argmax rounding keeps a near-tie from flipping with float
  * summation order. −1 (default) compares raw cosines (kmeansFit's
  * contract). The reported `cos` field is the compared (i.e. rounded
  * when roundScale ≥ 0) value. */
case class CosineArgmaxK(left: Expression, right: Expression,
    roundScale: Int = -1)
    extends BinaryExpression {
  override def dataType: DataType = CosineArgmaxK.outType
  override def prettyName: String = "cosine_argmax"

  private def vecIsDouble: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<array<double>>), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // The centroid matrix is constant (a literal in every caller), so its
  // K norms are hoisted out of the per-row loop — recomputing dot(c,c)
  // + sqrt per corpus row roughly doubled the centroid-side FLOPs of an
  // assignment (review finding). Same Math.sqrt over the same
  // accumulation, just once: bit-identical to the inline form. Non-
  // foldable matrices (none today) fall back to the per-row computation.
  @transient private lazy val centNorms: Array[Double] =
    if (right.foldable) {
      val cs = right.eval().asInstanceOf[ArrayData]
      if (cs == null) null else CosineArgmaxK.centroidNorms(cs)
    } else null

  override protected def nullSafeEval(v: Any, cs: Any): Any =
    CosineArgmaxK.eval(v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData],
      vecIsDouble, roundScale, centNorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val normsRef =
      if (centNorms == null) "null"
      else ctx.addReferenceObj("centNorms", centNorms, "double[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineArgmaxK$$.MODULE$$.eval($a, $b, $vecIsDouble, $roundScale, $normsRef)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineArgmaxK = copy(left = l, right = r)
}

object CosineArgmaxK {
  val outType: StructType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))

  /** Spark `round(double, scale)` arithmetic (HALF_UP via
    * BigDecimal.valueOf, NaN/Infinity unchanged) — replicated here so a
    * pre-argmax rounding contract stays bit-identical to the Column
    * form it replaces; pinned by the assignCells equivalence spec. */
  private def roundTo(x: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** sqrt(dot(c,c)) per centroid, the same accumulation order as the
    * per-row fallback in [[eval]]. */
  def centroidNorms(cents: ArrayData): Array[Double] = {
    val k = cents.numElements()
    val out = new Array[Double](k)
    var cid = 0
    while (cid < k) {
      val c = cents.getArray(cid)
      val m = c.numElements()
      var dcc = 0.0
      var j = 0
      while (j < m) {
        val y = c.getDouble(j)
        dcc += y * y
        j += 1
      }
      out(cid) = Math.sqrt(dcc)
      cid += 1
    }
    out
  }

  def eval(v: ArrayData, cents: ArrayData, vIsDouble: Boolean,
      roundScale: Int, norms: Array[Double])
      : org.apache.spark.sql.catalyst.InternalRow = {
    import org.apache.spark.sql.catalyst.util.SQLOrderingUtil
    val n = v.numElements()
    // norm(u): dot(u,u) with VecDotF32's accumulation order
    var duu = 0.0
    var i = 0
    while (i < n) {
      val x = if (vIsDouble) v.getDouble(i) else v.getFloat(i).toDouble
      duu += x * x
      i += 1
    }
    val nu = Math.sqrt(duu)
    val k = cents.numElements()
    var bestCid = 0
    var bestCos = 0.0
    var cid = 0
    while (cid < k) {
      val c = cents.getArray(cid)
      val m = c.numElements()
      val lim = math.min(n, m)
      var duv = 0.0
      var j = 0
      while (j < lim) {
        val x = if (vIsDouble) v.getDouble(j) else v.getFloat(j).toDouble
        duv += x * c.getDouble(j)
        j += 1
      }
      val nc = if (norms != null) norms(cid) else {
        var dcc = 0.0
        j = 0
        while (j < m) {
          val y = c.getDouble(j)
          dcc += y * y
          j += 1
        }
        Math.sqrt(dcc)
      }
      val raw = duv / (nu * nc)
      val cos = if (roundScale >= 0) roundTo(raw, roundScale) else raw
      if (cid == 0 || SQLOrderingUtil.compareDoubles(cos, bestCos) > 0) {
        bestCos = cos
        bestCid = cid
      }
      cid += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCid, bestCos))
  }

  /** (cid, cos) struct column: best-cosine centroid for `vec` out of the
    * foldable `cents` (array<array<double>> literal). `roundScale` ≥ 0
    * rounds each candidate cosine before the argmax (assignCells
    * contract); −1 compares raw cosines (kmeansFit contract). */
  def argmax(vec: Column, cents: Column, roundScale: Int = -1): Column =
    glue.toColumn(CosineArgmaxK(glue.toExpression(vec),
      glue.toExpression(cents), roundScale))
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
