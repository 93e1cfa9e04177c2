package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Scale utilities: bucketed co-located joins and skew salting — the two
  * shuffle-elimination levers the DataFrame API doesn't hand you
  * directly.
  */
object Scale {

  /** Persist a frame as a bucketed table: rows are hash-partitioned into
    * `buckets` files by `key` AT WRITE TIME, so any number of later
    * equi-joins/aggregations on `key` between same-bucketed tables plan
    * with ZERO Exchange — the 100 TB answer to "this fact-fact join
    * shuffles terabytes every night". */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction (assert with PlanSpec / explain: no Exchange). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, how: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), how)

  /** Salted join for skewed keys: explode the SMALL side `salt` ways,
    * scatter the big side's hot keys uniformly with a content-derived
    * salt, join on (key, salt). Turns one straggler partition into `salt`
    * even ones. AQE's skew-join handles sort-merge skew automatically;
    * salting is the explicit fallback when AQE can't (e.g. aggregations or
    * when a single key exceeds one executor). Row counts are preserved
    * exactly; the salt column never escapes.
    *
    * The salt hashes the big side's FULL row content (not
    * monotonically_increasing_id, whose value changes when a task retry
    * re-reads a lost shuffle block — the SPARK-23207 class of silent
    * row loss/duplication): identical inputs always land in the same
    * bucket, so retries and re-runs are bitwise-reproducible. Duplicate
    * rows share a bucket, which skews nothing unless the hot key's rows
    * are near-identical — pass a higher-entropy `saltSource` to
    * [[saltedJoinBy]] in that case (EXACT duplicate rows of one hot key
    * are the degenerate case no content salt can spread; dedup first or
    * accept the straggler). Columns Spark's hash functions reject
    * (MapType, and nested types containing one) are excluded from the
    * default salt source — previously a Map column anywhere in the big
    * side failed analysis (r5 advice); if EVERY column is unhashable the
    * call fails fast with a clear message instead of an analyzer error. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      how: String = "inner"): DataFrame = {
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = big.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty,
      "saltedJoin: no hashable columns to derive a stable salt from " +
        "(all columns are/contain MapType) — pass an explicit saltSource " +
        "to saltedJoinBy")
    saltedJoinBy(big, small, key, struct(cols.toIndexedSeq: _*), salt, how)
  }

  /** Salt derived from stable row content: same input row ⇒ same bucket,
    * across task retries and across runs. */
  def saltedJoinBy(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, salt: Int, how: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salt.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), how).drop("__salt")
  }

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partCols`. A filter on a partition column then prunes whole
    * directories at planning time (`PartitionFilters` on the scan, never
    * opening a file) — the difference between scanning 100 TB and
    * scanning one day of it. Partition columns must be low-cardinality
    * (date, region, flag): one dir per value, and a high-cardinality
    * partition key means millions of tiny files. */
  def writePartitioned(df: DataFrame, path: String, partCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)

  /** Z-order (Morton-curve) clustered write: scale both columns to
    * `bits`-bit integers by min-max range, interleave their bits into a
    * single Z-value, range-partition and sort the data by it, write.
    * Each output file then covers a small rectangle of the 2-D key
    * space instead of a stripe of one dimension — so parquet row-group
    * min/max statistics prune scans filtered on EITHER column (a plain
    * sort only serves its leading column). This is the layout trick
    * behind Delta/Iceberg Z-ordering, expressed with stock Spark: one
    * stats aggregate, one narrow map, one range shuffle.
    * Caveats at scale: min-max scaling assumes roughly uniform value
    * spread (use pre-ranked columns otherwise), and monotonically
    * growing domains (timestamps) belong in the leading partition dirs
    * of [[writePartitioned]], not in the Z-value. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      files: Int = 16, bits: Int = 16): Unit = {
    val mx = (1L << bits) - 1
    val stats = df.agg(
      min(col(c1).cast("double")), max(col(c1).cast("double")),
      min(col(c2).cast("double")), max(col(c2).cast("double"))).head()
    if ((0 until 4).exists(stats.isNullAt)) {
      // empty input or an all-NULL cluster column: no ranges to
      // interleave — write the data as-is rather than NPE mid-layout
      df.write.mode("overwrite").parquet(path)
      return
    }
    def scaled(c: String, mn: Double, mxv: Double) = {
      val span = if (mxv > mn) mxv - mn else 1.0
      least(greatest(((col(c).cast("double") - mn) / span * mx).cast("long"),
        lit(0L)), lit(mx))
    }
    val x = scaled(c1, stats.getDouble(0), stats.getDouble(1))
    val y = scaled(c2, stats.getDouble(2), stats.getDouble(3))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** One-pass table profile — the ANALYZE-style scan a 100 TB ingest
    * runs before planning a pipeline: per column, null count, HLL++
    * distinct sketch and min/max, all folded in a SINGLE aggregate over
    * ONE scan (partial aggregation map-side, a 1-row merge — no data
    * row ever shuffles), then melted to one row per column with
    * stack(). `withExact` adds exact count(DISTINCT) per column so a
    * test oracle can bound the sketch — leave it off at scale (every
    * exact distinct shuffles that column's values). min/max are emitted
    * as strings so one schema profiles any column mix; keep to
    * integer/string columns where engines render identically when
    * hash-comparing against an external oracle.
    *
    * `withApprox = false` (r17, guide §1.2 "don't compute things you
    * throw away") drops the HLL++ sketches from the aggregate for
    * callers that consume only nulls/min/max: the stack() melt
    * references every aggregated column, so Catalyst cannot prune an
    * unused sketch out of the plan on its own — a consumer that
    * projects the sketch away still paid 52 merged registers per
    * column per row (q86 measured 1.03 → 0.76 s at sf0.1 when the
    * consumer stopped carrying them). */
  def tableProfile(df: DataFrame, cols: Seq[String],
      withExact: Boolean = false, withApprox: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "tableProfile: no columns given")
    require(withApprox || !withExact,
      "tableProfile: withExact bounds the sketch — it needs withApprox")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn")) ++
        (if (withApprox)
          Seq(approx_count_distinct(col(c), 0.05).as(s"${c}__ad")) else Nil) ++
        Seq(
          min(col(c)).cast("string").as(s"${c}__mn"),
          max(col(c)).cast("string").as(s"${c}__mx")) ++
        (if (withExact) Seq(countDistinct(col(c)).as(s"${c}__xd")) else Nil)
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val fields = cols.map { c =>
      val approx = if (withApprox) s", ${c}__ad" else ""
      val exact = if (withExact) s", ${c}__xd" else ""
      s"'$c', __n - ${c}__nn$approx, ${c}__mn, ${c}__mx$exact"
    }.mkString(", ")
    val outCols = "column_name, n_null" +
      (if (withApprox) ", approx_distinct" else "") +
      ", min_value, max_value" +
      (if (withExact) ", exact_distinct" else "")
    one.selectExpr(s"stack(${cols.size}, $fields) AS ($outCols)")
  }

  /** Parquet-layout audit — the round-11 ingest rule
    * ("scan parallelism is bounded by ROW GROUPS per file, not split
    * math"; PERF.md) as an operator instead of a post-mortem. Per table
    * directly under `dir` (a bare `t.parquet` file or a directory of
    * part files): file count, row count, bytes, row-group count and
    * min/max per file, the split-math task count Spark would plan with
    * the CURRENT session conf (FilePartition.maxSplitBytes formula),
    * the usable parallelism = min(splits, row groups), and a verdict
    * against the session's core budget:
    *
    *  - `row_group_bound` — split math wants more tasks than row groups
    *    exist and the row groups can't feed every core: rewrite the
    *    table with smaller/more row groups (this is the layout that
    *    serialized the r11 sf1 corpus: 1 row group/file ⇒ a 32-core
    *    narrow pass ran on 3 tasks);
    *  - `split_bound` — row groups are plentiful but the session's
    *    maxPartitionBytes/openCostInBytes caps splits under the core
    *    budget: tune the session, not the files;
    *  - `small` — the whole table is under one default split, serial by
    *    nature (dimension tables; nothing to fix);
    *  - `ok` — the scan can feed every core.
    *
    * Footers only — no data pages are read. The footer reads are
    * DISTRIBUTED (one task per file batch): at 100 TB a table is tens
    * of thousands of files and the driver should aggregate, not read.
    * Only per-table aggregates return to the driver. */
  def rowGroupAudit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(hconf)
    val tables = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    // A hive-partitioned table (key=val subdirectories inside t.parquet/)
    // would contribute zero files — or partially count if it mixes
    // layouts — and silently vanish from the audit (r12 ADVICE). Skip it
    // with an explicit verdict row instead; this audit's split math is
    // per-leaf-directory anyway, so run it on the leaf dirs directly.
    // ...but only NON-HIDDEN subdirectories count as nesting: a batch
    // table carrying Spark bookkeeping (_spark_metadata from a streaming
    // writer, a leftover _temporary) has flat, auditable data files and
    // must not silently fall out of the audit (r13 ADVICE). Matches
    // Spark's own hidden-path filter (leading '_' or '.'); hive key=val
    // partition dirs never start with either.
    val (nested, flat) = tables.partition { st =>
      st.isDirectory && fs.listStatus(st.getPath).exists { d =>
        val n = d.getPath.getName
        d.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }
    }
    // (table, file path, file length) — leaf data files per table
    val files: Seq[(String, String, Long)] = flat.flatMap { st =>
      val t = st.getPath.getName.stripSuffix(".parquet")
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => (t, f.getPath.toString, f.getLen))
      else Seq((t, st.getPath.toString, st.getLen))
    }
    // A flat-classified dir with ZERO data files (a dead write's leftover
    // _temporary only, a streaming sink before its first commit) would
    // contribute nothing to perFile and silently vanish — the same
    // omission failure the nested-skip row exists to prevent (r14 review
    // pass). Give those an explicit verdict row too.
    val filedTables = files.map(_._1).toSet
    // r14 ADVICE: distinguish a truly empty dir from one holding only
    // non-parquet data files (e.g. CSV exports) — 'no data files' on
    // the latter could mask a mis-written table as an expected-empty
    // one. Hidden entries (_temporary, _SUCCESS, dotfiles) are not data.
    val emptyFlat: Seq[(String, String)] = flat
      .filter(st => !filedTables.contains(
        st.getPath.getName.stripSuffix(".parquet")))
      .map { st =>
        val hasNonParquetData = st.isDirectory &&
          fs.listStatus(st.getPath).exists(f => f.isFile &&
            !f.getPath.getName.endsWith(".parquet") &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
        (st.getPath.getName.stripSuffix(".parquet"),
         if (hasNonParquetData) "skipped: no parquet data files"
         else "skipped: no data files")
      }
    require(files.nonEmpty || nested.nonEmpty || emptyFlat.nonEmpty,
      s"rowGroupAudit: no *.parquet under $dir")
    // session split math, per table (FilePartition.maxSplitBytes)
    val maxPartitionBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val coreBudget = spark.sparkContext.defaultParallelism
    val minPartitionNum = spark.sessionState.conf.filesMinPartitionNum
      .getOrElse(coreBudget)
    // footer reads run as a distributed map; the hadoop conf rides a
    // broadcast (SerializableWritable — Configuration itself is not
    // serializable)
    val bcConf = spark.sparkContext.broadcast(
      new org.apache.spark.SerializableWritable(hconf))
    val perFile = spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, coreBudget)))
      .map { case (t, path, len) =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(path), bcConf.value.value))
        try {
          val blocks = reader.getFooter.getBlocks
          val nGroups = blocks.size().toLong
          val nRows = blocks.asScala.map(_.getRowCount).sum
          (t, len, nGroups, nRows)
        } finally reader.close()
      }
      .toDF("table", "bytes", "row_groups", "rows")
    val agg = perFile.groupBy($"table").agg(
      count(lit(1)).as("n_files"),
      sum($"rows").as("n_rows"),
      sum($"bytes").as("total_bytes"),
      sum($"row_groups").as("n_row_groups"),
      min($"row_groups").as("min_row_groups_per_file"),
      max($"row_groups").as("max_row_groups_per_file"),
      // split-math tasks under the current session conf: per file
      // ceil(len / maxSplitBytes), maxSplitBytes =
      // min(maxPartitionBytes, max(openCost, (Σ(len+openCost))/minPartitionNum))
      sum($"bytes" + openCost).as("__padded"))
    val audited = agg
      .withColumn("__maxSplit",
        least(lit(maxPartitionBytes),
          greatest(lit(openCost), ($"__padded" / minPartitionNum).cast("long"))))
      // per-file ceil would need the per-file lengths; bound it with the
      // table-total ceil, exact for the common one-file-per-table layout
      // and within n_files of exact otherwise
      .withColumn("split_tasks",
        greatest(ceil($"total_bytes" / $"__maxSplit"), $"n_files"))
      .withColumn("usable_tasks", least($"split_tasks", $"n_row_groups"))
      .withColumn("core_budget", lit(coreBudget.toLong))
      .withColumn("verdict",
        when($"total_bytes" <= $"__maxSplit", lit("small"))
          .when($"usable_tasks" >= $"core_budget", lit("ok"))
          .when($"n_row_groups" < $"split_tasks", lit("row_group_bound"))
          .otherwise(lit("split_bound")))
      .drop("__padded", "__maxSplit")
    val skipRows: Seq[(String, String)] =
      nested.map(st => (st.getPath.getName.stripSuffix(".parquet"),
        "skipped: nested layout")) ++
      emptyFlat
    val withSkipped =
      if (skipRows.isEmpty) audited
      else {
        // one null-metric row per skipped table so the omission is visible
        val skipped = skipRows
          .toDF("table", "__verdict")
          .select($"table",
            lit(null).cast("long").as("n_files"),
            lit(null).cast("long").as("n_rows"),
            lit(null).cast("long").as("total_bytes"),
            lit(null).cast("long").as("n_row_groups"),
            lit(null).cast("long").as("min_row_groups_per_file"),
            lit(null).cast("long").as("max_row_groups_per_file"),
            lit(null).cast("long").as("split_tasks"),
            lit(null).cast("long").as("usable_tasks"),
            lit(coreBudget.toLong).as("core_budget"),
            $"__verdict".as("verdict"))
        audited.unionByName(skipped)
      }
    withSkipped.orderBy($"table")
  }

  /** Scope Spark's runtime bloom-filter join pruning (Spark ≥ 3.4,
    * `InjectRuntimeFilter`): when one join side carries a selective
    * filter, Spark builds a bloom filter over its join keys at runtime
    * and semi-prunes the other side's scan with `might_contain` BEFORE
    * the shuffle — at 100 TB this drops most of a fact table's shuffle
    * volume for dimension-filtered joins without bucketing anything.
    * The defaults only engage above a 10 GB application-side scan
    * (pointless below; the bloom build costs a pass over the creation
    * side), so tests/small runs must lower the thresholds explicitly —
    * which is what this helper scopes and restores. */
  def withRuntimeBloomJoin[T](spark: SparkSession,
      applicationSideScanThreshold: String = "0",
      creationSideThreshold: String = "100MB")(f: => T): T = {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        -> applicationSideScanThreshold,
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
        -> creationSideThreshold)
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
