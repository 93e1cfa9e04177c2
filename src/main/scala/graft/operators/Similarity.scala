package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>` or
  * `array<double>` — the fused expressions bind to the file's physical
  * element width, see VecDotF32).
  *
  * Baseline: brute-force cosine top-k (exact — broadcast the query set,
  * scan the corpus once, per-partition heaps via TakeOrderedAndProject /
  * window top-k). Scale path: IVF-style coarse quantization and
  * random-hyperplane LSH bucketing, both as equi-joins.
  */
object Similarity {

  /** Dot product — fused native expression (graft.functions.VecDotF32):
    * one primitive loop per pair, no intermediate array allocation (the
    * zip_with+aggregate form allocates per pair, which dominates all-pairs
    * joins). Accumulates in double, matching the oracle bit-for-bit. */
  def dot(u: Column, v: Column): Column = graft.functions.VecDotF32.dot(u, v)

  def norm(v: Column): Column = graft.functions.VecDotF32.norm(v)

  def cosine(u: Column, v: Column): Column = graft.functions.VecDotF32.cosine(u, v)

  /** Exact brute-force top-k neighbors for each query vector.
    * `queries` MUST be small (it is broadcast); the corpus streams. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      norm(col(corpusVec)).as("__cn"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
      norm(col(queryVec)).as("__qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: plane j component i
    * derived from a hash — no data shipping, same constants on every
    * executor. Returns array<int> of sign bits (planes entries). */
  def hyperplaneSignature(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planeVals: Seq[Seq[Double]] =
      Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
    array(planeVals.map { p =>
      val proj = (0 until dim).map(i => element_at(vec, i + 1).cast(DoubleType) * lit(p(i)))
        .reduce(_ + _)
      when(proj >= 0, 1).otherwise(0)
    }: _*)
  }

  /** IVF-style ANN with k-means-fitted coarse cells: centroids come from
    * [[kmeansFit]] (spherical Lloyd, deterministic init), so cells carve
    * the corpus along its actual density — a sorted-id sample has no
    * geometric meaning and its recall is luck. Corpus rows are assigned
    * to their nearest centroid cell (one broadcast join); each query
    * probes its `nprobe` nearest cells and searches only those rows.
    * `fitIters` tunes the Lloyd loop (each iteration is one broadcast
    * scan + one K×dim aggregate; the corpus stays persisted across
    * iterations inside kmeansFit). Explicit `centroids` skip the fit —
    * the production shape, where cells are trained once on a sample and
    * reused by every batch. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, nCells: Int, nprobe: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec",
      fitIters: Int = 5, centroids: Option[Seq[Array[Double]]] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents: Seq[Array[Double]] = centroids.getOrElse(
      kmeansFit(corpus, nCells, fitIters, corpusId, corpusVec)._1)
    val centFrame = cents.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("cell_id", "cell_vec")
    ivfTopKWithCells(corpus, queries, centFrame, k, nprobe,
      corpusId, corpusVec, queryId, queryVec)
  }

  /** IVF search against an explicit centroid frame (cell_id, cell_vec) —
    * the assign/probe/search machinery shared by [[ivfTopK]]. */
  def ivfTopKWithCells(
      corpus: DataFrame, queries: DataFrame, centroidFrame: DataFrame,
      k: Int, nprobe: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val centroids = centroidFrame
      .select(col("cell_id"), col("cell_vec"))
    // assign corpus rows to nearest cell (scores rounded before the
    // arg-max so float summation order can't flip a near-tie — keeps the
    // assignment engine-stable and oracle-reproducible)
    val assigned = corpus.crossJoin(broadcast(centroids))
      .withColumn("__d", round(dot(col(corpusVec), col("cell_vec")) /
        (norm(col(corpusVec)) * norm(col("cell_vec"))), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(corpusId)).orderBy(col("__d").desc, col("cell_id"))))
      .filter(col("__rn") === 1)
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"), col("cell_id"))
    // each query probes nprobe nearest cells
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("__d", round(dot(col(queryVec), col("cell_vec")) /
        (norm(col(queryVec)) * norm(col("cell_vec"))), 6))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(queryId)).orderBy(col("__d").desc, col("cell_id"))))
      .filter(col("__rn") <= nprobe)
      .select(col(queryId).as("query_id"), col(queryVec).as("__qv"), col("cell_id"))
    // search only the probed cells (equi-join on cell_id — no cross join)
    val scored = assigned.join(probes, "cell_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(col("__cv"), col("__qv")) /
        (norm(col("__cv")) * norm(col("__qv"))), 6))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Spherical k-means, full Lloyd loop (the training step behind
    * [[ivfTopK]]'s cells; the per-iteration assign is the s04 query).
    * Per iteration: K centroids broadcast, every row scored in one
    * narrow pass (fused dot/norm), assignment by max cosine; centroid
    * update is `avg` per (cluster, dimension) over the posexploded
    * vectors — partial aggregation map-side, so the shuffle carries
    * K×dim partial sums per partition, not vectors. The only driver
    * state between iterations is the K×dim centroid matrix (what MLlib
    * keeps too); corpus never leaves the executors.
    * Deterministic: init = first K vectors by id, ties break on cid.
    * Returns (centroids, assignments(idCol, cid, cosine)).
    *
    * Centroids are carried as Array[Double] regardless of the corpus's
    * physical element width (float[] or double[] — Tables.normalize
    * passes both through and the fused dot adapts). For a FLOAT corpus
    * the numeric path is bit-identical to the historical all-float one:
    * init doubles are exact widenings of the file's floats, and each
    * Lloyd mean is quantized through `.toFloat` before reuse, so every
    * double entering the arithmetic is an exact widening of the float
    * the old code used. A DOUBLE corpus keeps full precision end-to-end,
    * matching what a double-reading oracle computes. */
  def kmeansFit(corpus0: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (Seq[Array[Double]], DataFrame) = {
    val spark = corpus0.sparkSession
    import spark.implicits._
    val corpusIsF32 = corpus0.schema(vecCol).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // one scan feeds init + every iteration — don't re-read lineage per pass
    val corpus = OperatorCaches.track(corpus0.select(col(idCol), col(vecCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var cents: Seq[Array[Double]] = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast(ArrayType(DoubleType))).as[Array[Double]]
      .collect().toSeq
    // best centroid per row via max_by partial aggregation: the shuffle
    // carries ONE pre-reduced row per (partition, id), not the N×K
    // scored stream a window(row_number) would sort-exchange. Ties break
    // to the lowest cid: maximize (cos, -cid).
    def assign(c: Seq[Array[Double]]): DataFrame = {
      val cdf = broadcast(c.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("cid", "cvec"))
      corpus.crossJoin(cdf)
        .withColumn("__cos", cosine(col(vecCol), col("cvec")))
        .groupBy(col(idCol))
        .agg(max_by(struct(col("cid"), col("__cos"), col(vecCol).as("__v")),
          struct(col("__cos"), -col("cid"))).as("__b"))
        .select(col(idCol), col("__b.cid").as("cid"),
          col("__b.__cos").as("__cos"), col("__b.__v").as(vecCol))
    }
    for (_ <- 0 until iters) {
      val a = assign(cents)
      // per-(cluster, dim) mean; K×dim rows come back to the driver.
      // Float corpora quantize each mean through float (the historical
      // all-Array[Float] behavior — keeps fitted cells, and therefore
      // s02's recorded metrics, bit-identical); double corpora keep the
      // full-precision mean.
      val upd = a.select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map { r =>
            val m = r.getDouble(2)
            if (corpusIsF32) m.toFloat.toDouble else m
          }
        }
      // empty clusters keep their previous centroid
      cents = cents.indices.map(i => upd.get(i).map(_.toArray).getOrElse(cents(i)))
    }
    val out = assign(cents)
      .select(col(idCol), col("cid"), round(col("__cos"), 6).as("cosine"))
    // corpus stays persisted: `out` is lazy and reads it; callers that
    // are done with the assignments release via OperatorCaches.release()
    // (the bench harness clears all persisted frames between queries)
    (cents, out)
  }

  /** Per-group medoid: for each label, the member vector closest (squared
    * L2) to the group's mean vector — the "most representative example per
    * cluster" selection step of diversity-sampling pipelines.
    *
    * Distributed shape: centroids via posexplode + avg per (label, dim) —
    * partial aggregation means the shuffle carries |labels|×dim partial
    * sums per partition, not vectors; distances re-join the exploded
    * corpus to the (tiny) centroid frame on (label, dim) with the
    * centroid side broadcast; the arg-min per label is a max_by partial
    * aggregation (no window sort). Distances are rounded before the
    * arg-min so the selection is stable under float-summation-order
    * differences; ties break to the lowest id. */
  def clusterMedoids(corpus: DataFrame, labelCol: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = corpus.select(col(labelCol).as("label"), col(idCol).as("id"),
      posexplode(col(vecCol)).as(Seq("pos", "x")))
    val cent = e.groupBy(col("label"), col("pos")).agg(avg(col("x")).as("c"))
    val d2 = e.join(broadcast(cent), Seq("label", "pos"))
      .groupBy(col("label"), col("id"))
      .agg(round(sum((col("x") - col("c")) * (col("x") - col("c"))), 4).as("d2"))
    d2.groupBy(col("label"))
      .agg(max_by(struct(col("id"), col("d2")), struct(-col("d2"), -col("id"))).as("__b"))
      .select(col("label"), col("__b.id").as(idCol), col("__b.d2").as("d2"))
  }
}
