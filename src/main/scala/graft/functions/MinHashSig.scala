package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** All MinHash signature slots in ONE pass over the shingle array.
  *
  * sig_i = min over shingles of (a_i * h(s) + b_i mod P), h = xxhash64
  * folded into [0, P), P = 2^31-1 — identical arithmetic to the
  * explode + 64-partial-min-aggregates form in Dedup.minhashSignatures,
  * but as a narrow map: no explode, no shuffle, no aggregation state.
  * Per shingle: one hash + numHashes fused multiply-mods.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val ab: (Array[Long], Array[Long]) =
    MinHashSig.constants(numHashes, seed)

  // accepts array<string> (raw grams, hashed here) or array<long>
  // (pre-hashed by ShingleHashes — same xxhash64, so identical signatures)
  private def preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    if (preHashed) MinHashSig.evalHashed(input.asInstanceOf[ArrayData], ab._1, ab._2)
    else MinHashSig.eval(input.asInstanceOf[ArrayData], ab._1, ab._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Two typed long[] references, NOT one Tuple2: Tuple2._1() erases to
    // Object in Java, which janino can't match against eval's long[]
    // parameters (the compile failure silently dropped the whole stage to
    // interpreted mode).
    val aRef = ctx.addReferenceObj("minhashA", ab._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", ab._2, "long[]")
    val fn = if (preHashed) "evalHashed" else "eval"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig$$.MODULE$$.$fn($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val P: Long = 2147483647L // Mersenne prime 2^31-1, matches Dedup.MinHashPrime

  /** Same constant derivation as Dedup.perms (seeded, a∈[1,P), b∈[0,P)). */
  def constants(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = 1L + math.floorMod(rnd.nextLong(), P - 1)
      b(i) = math.floorMod(rnd.nextLong(), P)
      i += 1
    }
    (a, b)
  }

  def eval(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val m = a.length
    val mins = new Array[Long](m)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      // same value as Spark's xxhash64(string) with default seed 42
      val h0 = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        s, StringType, 42L)
      var h = h0 % P; if (h < 0) h += P
      var j = 0
      while (j < m) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** [[eval]] over pre-hashed grams: h0 is the element itself (already
    * xxhash64'd at shingle time), so per slot only the fold + the
    * multiply-mod chain remain. Bit-identical to [[eval]] over the
    * corresponding strings. */
  def evalHashed(hashes: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val m = a.length
    val mins = new Array[Long](m)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      var h = hashes.getLong(i) % P; if (h < 0) h += P
      var j = 0
      while (j < m) {
        val v = (a(j) * h + b(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(mins, 0L)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(mins)
  }

  def minhashSig(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    glue.toColumn(MinHashSig(glue.toExpression(shingles), numHashes, seed))
}
