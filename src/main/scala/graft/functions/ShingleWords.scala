package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** Distinct word k-shingles of a text in ONE native pass: lowercase,
  * whitespace-split, sliding k-gram join, first-occurrence dedup.
  *
  * The built-in composition (normalize → split → transform(sequence,
  * slice+concat_ws) → array_distinct) runs the higher-order lambdas
  * interpreted (HOFs are outside whole-stage codegen) and dominated the
  * whole MinHash pipeline (~6.7 s of a 10 s run at sf0.1). This fused
  * expression does the same work in a single String walk + LinkedHashSet.
  */
case class ShingleWords(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_words"

  override protected def nullSafeEval(input: Any): Any =
    ShingleWords.eval(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleWords$$.MODULE$$.eval($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleWords =
    copy(child = newChild)
}

object ShingleWords {
  def eval(text: UTF8String, k: Int): ArrayData = {
    // normalize: lowercase + split on whitespace runs (matches
    // TextOps.normalize + split(" ") semantics)
    val s = text.toString.toLowerCase
    val words = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        words += s.substring(start, i)
      }
    }
    val out = new java.util.LinkedHashSet[String]
    if (words.length >= k) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= words.length - k) {
        sb.setLength(0)
        var m = 0
        while (m < k) {
          if (m > 0) sb.append(' ')
          sb.append(words(j + m))
          m += 1
        }
        out.add(sb.toString)
        j += 1
      }
    } else {
      out.add(words.mkString(" "))
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(arr)
  }

  def shingleWords(text: Column, k: Int): Column =
    glue.toColumn(ShingleWords(glue.toExpression(text), k))

  /** Hashed variant of [[eval]]: same walk, but each distinct k-gram is
    * folded to its xxhash64 (seed 42 — bit-identical to Spark's
    * `xxhash64(gram)` over the same string) and deduped on the hash.
    * One codegen'd pass replaces shingle-string materialization + a
    * per-branch interpreted `transform(sh, xxhash64)` downstream, and the
    * persisted frame carries 8-byte longs instead of multi-word strings
    * (~8× smaller — the frame every dedup pass re-reads at 100 TB). */
  def evalHashed(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString.toLowerCase
    val words = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        words += s.substring(start, i)
      }
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]
    def hashGram(g: String): java.lang.Long =
      java.lang.Long.valueOf(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          UTF8String.fromString(g), StringType, 42L))
    if (words.length >= k) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= words.length - k) {
        sb.setLength(0)
        var m = 0
        while (m < k) {
          if (m > 0) sb.append(' ')
          sb.append(words(j + m))
          m += 1
        }
        out.add(hashGram(sb.toString))
        j += 1
      }
    } else {
      out.add(hashGram(words.mkString(" ")))
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next().longValue(); p += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(arr)
  }

  def shingleHashes(text: Column, k: Int): Column =
    glue.toColumn(ShingleHashes(glue.toExpression(text), k))

  /** Plain tokenization (all words, duplicates kept) — same fused walk,
    * k-gram/dedup skipped. Feeds SimHash64. */
  def tokenize(text: UTF8String): ArrayData = {
    val s = text.toString.toLowerCase
    val out = new scala.collection.mutable.ArrayBuffer[Any](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
        out += UTF8String.fromString(s.substring(start, i))
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** [[ShingleWords]] with the xxhash64 fold fused in: emits the distinct
  * k-gram HASHES (array<long>) directly. The dedup pipelines never need
  * the gram strings — every downstream consumer (MinHash permutations,
  * the inverted index, array-intersect verification) works on 64-bit
  * keys — so hashing at shingle time removes a whole string
  * materialization and an interpreted HOF re-hash per consumer. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleWords.evalHashed(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleWords$$.MODULE$$.evalHashed($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Fused lowercase whitespace tokenizer (duplicates kept). */
case class TokenizeWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_words"
  override protected def nullSafeEval(input: Any): Any =
    ShingleWords.tokenize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleWords$$.MODULE$$.tokenize($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

object TokenizeWords {
  def tokenizeWords(text: Column): Column =
    glue.toColumn(TokenizeWords(glue.toExpression(text)))
}
