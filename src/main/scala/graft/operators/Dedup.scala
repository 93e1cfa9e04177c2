package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.SimHash64

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the 100 TB contract):
  *  - candidate generation is always a *bucketed equi-join* (LSH band,
  *    simhash chunk, shared shingle) — never a cross join
  *  - signatures are built in one narrow pass (arrays of built-in
  *    expressions or the fused SimHash64 native expression)
  *  - pathological buckets (a shingle/band shared by thousands of docs)
  *    are capped with `maxBucket` — standard LSH practice; at 100 TB an
  *    uncapped hot bucket is a quadratic blowup on one executor
  */
object Dedup {

  // ---- shingling --------------------------------------------------------

  /** Distinct word k-grams of the normalized text (order-preserving
    * sliding window, then set semantics). */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = split(TextOps.normalize(text), " ")
    val n = size(words)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(0), n - lit(k)),
          i => concat_ws(" ", slice(words, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", words))))
  }

  // ---- exact ------------------------------------------------------------

  /** Exact dedup on the normalized-text fingerprint: one hash-shuffle,
    * keeps the lowest id per group (deterministic representative). */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextOps.fingerprint(col(textCol))
    df.withColumn("__fp", fp)
      .withColumn("__keep", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__fp", "__keep")
  }

  /** Exact-dup group summary: (n_docs, n_distinct, n_dup_groups). */
  def exactDupStats(df: DataFrame, textCol: String): DataFrame = {
    val groups = df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("cnt"))
    groups.agg(
      sum(col("cnt")).as("n_docs"),
      count(lit(1)).as("n_distinct"),
      count(when(col("cnt") > 1, lit(1))).as("n_dup_groups"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Mersenne prime 2^31-1: permutation arithmetic stays far below 2^63,
    * so ANSI mode (Spark 4 default — overflow throws) is safe. */
  val MinHashPrime = 2147483647L

  /** Deterministic hash-permutation constants a∈[1,P), b∈[0,P). */
  private def perms(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (1L + math.floorMod(rnd.nextLong(), MinHashPrime - 1),
       math.floorMod(rnd.nextLong(), MinHashPrime)))
  }

  /** MinHash signature (array<long>, one slot per hash function):
    * sig_i = min over shingles of (a_i * h(s) + b_i mod P) with
    * h = xxhash64 folded into [0, P). One narrow pass, overflow-free. */
  def minhashSignature(shingleArr: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    array(perms(numHashes, seed).map { case (a, b) =>
      array_min(transform(shingleArr,
        s => pmod(pmod(xxhash64(s), lit(MinHashPrime)) * lit(a) + lit(b), lit(MinHashPrime))))
    }: _*)

  /** LSH banding: split the signature into `bands` bands of
    * numHashes/bands rows; each band hashes to a bucket key. Returns
    * array<struct<band:int, bucket:long>> for exploding. */
  def lshBands(sig: Column, numHashes: Int, bands: Int): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
             xxhash64(concat_ws(",",
               slice(sig, b * rows + 1, rows).cast(ArrayType(StringType)))).as("bucket"))
    }: _*)
  }

  /** Candidate pairs from LSH buckets (id1 < id2), hot buckets capped. */
  private def bucketPairs(exploded: DataFrame, idCol: String, maxBucket: Int): DataFrame = {
    val capped = exploded
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
    val l = capped.select(col("band"), col("bucket"), col(idCol).as("id1"))
    val r = capped.select(col("band"), col("bucket"), col(idCol).as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** MinHash-LSH near-dup pairs with exact-Jaccard verification.
    * Returns (id1, id2, jaccard) for pairs ≥ threshold. */
  def dedupMinHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val withShingles = df.select(col(idCol), shingles(col(textCol), k).as("sh"))
    val sigs = withShingles.select(col(idCol),
      explode(lshBands(minhashSignature(col("sh"), numHashes), numHashes, bands)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = bucketPairs(sigs, idCol, maxBucket)
    verifyJaccard(cands, withShingles, idCol, threshold)
  }

  /** Join candidate pairs back to shingle sets and compute exact Jaccard. */
  def verifyJaccard(pairs: DataFrame, withShingles: DataFrame, idCol: String,
      threshold: Double): DataFrame = {
    val s1 = withShingles.select(col(idCol).as("id1"), col("sh").as("sh1"))
    val s2 = withShingles.select(col(idCol).as("id2"), col("sh").as("sh2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh1"), col("sh2"))).cast(DoubleType) /
        size(array_union(col("sh1"), col("sh2"))).cast(DoubleType), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ---- n-gram Jaccard (exact, complete) ---------------------------------

  /** All pairs with Jaccard ≥ threshold, found exactly: candidates =
    * pairs sharing ≥1 shingle (the only pairs with jaccard > 0), via an
    * inverted-index equi-join on the shingle. `maxDocFreq` drops shingles
    * appearing in more docs than the cap — at threshold ≥ 0.3 a pair
    * sharing ONLY ultra-common shingles can't pass verification anyway
    * when each doc has > maxDocFreq/threshold distinct shingles; at test
    * scale we keep the cap high enough to be lossless. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.3, maxDocFreq: Int = 100000): DataFrame = {
    val withShingles = df.select(col(idCol), shingles(col(textCol), k).as("sh"))
    val inv = withShingles.select(col(idCol), explode(col("sh")).as("shingle"))
    val capped = inv
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("__df") <= maxDocFreq)
    val cands = capped.select(col("shingle"), col(idCol).as("id1"))
      .join(capped.select(col("shingle"), col(idCol).as("id2")), Seq("shingle"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    verifyJaccard(cands, withShingles, idCol, threshold)
  }

  // ---- SimHash ----------------------------------------------------------

  /** SimHash near-dup pairs: fused 64-bit fingerprint, candidates via the
    * pigeonhole banding (4 × 16-bit chunks: hamming ≤ 3 ⇒ ≥ 1 equal
    * chunk), verified with bit_count(xor) ≤ maxHamming. */
  def dedupSimHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val sigs = df.select(col(idCol),
      SimHash64.simhash64(split(TextOps.normalize(col(textCol)), " ")).as("sig"))
    val chunked = sigs.select(col(idCol), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("band"),
               shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val capped = chunked
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__bn") <= maxBucket).drop("__bn")
    val l = capped.select(col("band"), col("bucket"), col(idCol).as("id1"), col("sig").as("sig1"))
    val r = capped.select(col("band"), col("bucket"), col(idCol).as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), bit_count(col("sig1").bitwiseXOR(col("sig2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- embedding cosine near-dup ----------------------------------------

  /** Exact cosine near-dup pairs ≥ threshold. Exact variant: block the
    * cross product by random-hyperplane sign buckets would be approximate;
    * the exact path is a (small-side broadcast) self-join — use only when
    * one side fits in memory, else use [[Similarity.hyperplaneBuckets]]
    * candidates + verify. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id1"), col(vecCol).as("v1"),
      Similarity.norm(col(vecCol)).as("n1"))
    val w = df.select(col(idCol).as("id2"), col(vecCol).as("v2"),
      Similarity.norm(col(vecCol)).as("n2"))
    v.join(w, col("id1") < col("id2"))
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) / (col("n1") * col("n2")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** LSH-bucketed (approximate) cosine near-dup: random-hyperplane sign
    * bands generate candidates, exact cosine verifies. The scale path. */
  def cosineNearDupLSH(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, planes: Int = 16, bands: Int = 4,
      seed: Long = 7L, maxBucket: Int = 10000): DataFrame = {
    val sig = Similarity.hyperplaneSignature(col(vecCol), dim, planes, seed)
    val rowsPerBand = planes / bands
    val withSig = df.select(col(idCol), col(vecCol), sig.as("hsig"))
    val exploded = withSig.select(col(idCol), col(vecCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(concat_ws(",", slice(col("hsig"), b * rowsPerBand + 1, rowsPerBand)
            .cast(ArrayType(StringType)))).as("bucket"))
      }: _*)).as("bb"))
      .select(col(idCol), col(vecCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val capped = exploded
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__bn") <= maxBucket).drop("__bn")
    val l = capped.select(col("band"), col("bucket"), col(idCol).as("id1"), col(vecCol).as("v1"))
    val r = capped.select(col("band"), col("bucket"), col(idCol).as("id2"), col(vecCol).as("v2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("v1"), col("v2")).distinct()
      .withColumn("cosine", round(
        Similarity.dot(col("v1"), col("v2")) /
        (Similarity.norm(col("v1")) * Similarity.norm(col("v2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }
}
