package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** 64-bit SimHash over an array<string> of tokens.
  *
  * A single-pass native Catalyst expression: 64 signed bit-counters
  * accumulated from each token's 64-bit hash, sign of each counter gives
  * the output bit. Doing this with built-ins would need 64 array
  * traversals per row; one fused pass keeps it scan-speed at 100 TB
  * (preference (b) of the build plan — custom Expression before custom
  * operator).
  *
  * Token hash = murmur3-ish avalanche of UTF8 bytes (self-contained,
  * deterministic across JVMs — no dependence on String.hashCode).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.eval(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** fmix64 finalizer from MurmurHash3 — public-domain avalanche step. */
  @inline private[functions] def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  private[functions] def hashToken(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < bytes.length) {
      h = fmix64(h ^ (bytes(i) & 0xffL) ^ (i.toLong << 32))
      i += 1
    }
    h
  }

  def eval(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hashToken(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level entry point. */
  def simhash64(tokens: Column): Column =
    glue.toColumn(SimHash64(glue.toExpression(tokens)))
}

/** 128-bit SimHash over an array<string> of tokens: array<long> [lo, hi].
  *
  * The scale tier of [[SimHash64]] — a 64-bit fingerprint's band space
  * tops out at 2^bits per band with bands·bits ≤ 64, so at ~10⁹ docs
  * either occupancy saturates the bucket cap (16-bit bands) or the
  * pigeonhole guarantee collapses (one 32-bit band pair). Two words give
  * `Dedup.simHashBandsFor` room to widen bands with n AND keep ≥4 of
  * them. One fused pass: each token contributes TWO avalanche-derived
  * 64-bit hashes (h, fmix64(h ^ salt)) feeding 128 signed counters; word
  * 0 (lo) is bit-identical to [[SimHash64]] on the same tokens
  * (spec-pinned), so 64-bit fingerprints/hamming embed in the wide ones.
  */
case class SimHash128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash128"

  override protected def nullSafeEval(input: Any): Any =
    SimHash128.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128$$.MODULE$$.eval($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

object SimHash128 {
  /** Salt deriving each token's second word-hash from its first —
    * fmix64's avalanche makes the two words' bits independent. */
  private val WordSalt = 0x71c9b1feb1a2d289L

  def eval(arr: ArrayData): ArrayData = {
    val counters = new Array[Int](128)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h1 = SimHash64.hashToken(arr.getUTF8String(i))
        val h2 = SimHash64.fmix64(h1 ^ WordSalt)
        var b = 0
        while (b < 64) {
          if (((h1 >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          if (((h2 >>> b) & 1L) == 1L) counters(64 + b) += 1
          else counters(64 + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) lo |= (1L << b)
      if (counters(64 + b) > 0) hi |= (1L << b)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(lo, hi))
  }

  /** Column-level entry point. */
  def simhash128(tokens: Column): Column =
    glue.toColumn(SimHash128(glue.toExpression(tokens)))
}
