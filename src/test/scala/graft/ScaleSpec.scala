package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with zero Exchange") {
    // uses the session's default warehouse dir (spark-warehouse/, gitignored);
    // clear leftovers from prior runs (dropped tables can leave dirs behind)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    for (t <- Seq("b_orders", "b_lineitem")) {
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists) { d.listFiles.foreach(_.delete()); d.delete() }
    }
    Scale.writeBucketed(Tables.load(spark, sf, "orders"), "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.load(spark, sf, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)
    // at test scale AQE would broadcast instead; force the shuffle-join
    // path so the bucketing guarantee (no hash-partition Exchange) shows
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan expected:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    // row count equals the plain join
    val plain = Tables.load(spark, sf, "orders").join(
      Tables.load(spark, sf, "lineitem"), $"o_orderkey" === $"l_orderkey")
    assert(joined.count() == plain.count())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("withRowIdScaled: deterministic across input partitionings, matches global window") {
    import graft.operators.Relational
    val base = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_linenumber")
    val order = Seq(col("l_orderkey"), col("l_linenumber"))
    def ids(df: org.apache.spark.sql.DataFrame, parts: Int) =
      Relational.withRowIdScaled(df, order, numPartitions = parts)
        .select($"l_orderkey", $"l_linenumber", $"rowid")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // same ids no matter how the INPUT is partitioned or how many range
    // partitions the operator uses — rowid is the global rank in `order`
    val a = ids(base.repartition(3), 5)
    val b = ids(base.repartition(11), 2)
    assert(a == b, "rowid must be a pure function of the total order")
    // and it agrees with the small-frame global-window formulation
    val w = Relational.withRowId(base, order)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == w, "scaled and global-window rowid must agree")
    spark.sharedState.cacheManager.clearCache()
  }

  test("salted join preserves exact join semantics") {
    val big = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey".as("k"), $"l_quantity")
    val small = Tables.load(spark, sf, "orders")
      .select($"o_orderkey".as("k"), $"o_orderpriority")
    val salted = Scale.saltedJoinBy(big, small, "k", col("l_quantity"), 8)
    val plain = big.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    val a = salted.groupBy($"o_orderpriority").agg(round(sum($"l_quantity"), 2).as("s"))
      .orderBy($"o_orderpriority").collect().toSeq
    val b = plain.groupBy($"o_orderpriority").agg(round(sum($"l_quantity"), 2).as("s"))
      .orderBy($"o_orderpriority").collect().toSeq
    assert(a == b)
  }

  test("salted join is retry-deterministic: identical results across runs") {
    // the default saltedJoin hashes full row content (never
    // monotonically_increasing_id, which changes value when a task retry
    // re-reads a lost shuffle block — SPARK-23207-class row loss): two
    // independent runs must produce bitwise-identical row sets
    val big = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey".as("k"), $"l_quantity", $"l_extendedprice")
    val small = Tables.load(spark, sf, "orders")
      .select($"o_orderkey".as("k"), $"o_orderpriority")
    def runOnce() = Scale.saltedJoin(big, small, "k", 8)
      .orderBy($"k", $"l_quantity", $"l_extendedprice", $"o_orderpriority")
      .collect().toSeq
    val (a, b) = (runOnce(), runOnce())
    assert(a == b, "salted join must be deterministic across runs")
    assert(a.size == big.join(small, Seq("k")).count(),
      "salting must preserve exact join cardinality")
  }

  test("partitioned write prunes directories at plan time (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val li = Tables.load(spark, sf, "lineitem")
    Scale.writePartitioned(li, dir, "l_returnflag")
    val back = spark.read.parquet(dir).filter($"l_returnflag" === "R")
    val scanLine = back.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("PartitionFilters:") && scanLine.contains("l_returnflag"),
      s"returnflag filter should prune partitions, not rows:\n$scanLine")
    // pruning must not change results
    assert(back.count() == li.filter($"l_returnflag" === "R").count())
  }

  test("z-ordered write clusters BOTH columns per file (row-group skip layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = Tables.load(spark, sf, "lineitem")
    Scale.writeZOrdered(li, dir, "l_orderkey", "l_extendedprice", files = 16)
    val back = spark.read.parquet(dir)
    // per-file value span, as a fraction of the global span, averaged
    def avgSpanFrac(c: String): Double = {
      val g = li.agg(max(col(c)).cast("double") - min(col(c)).cast("double")).head().getDouble(0)
      val spans = back.groupBy(input_file_name())
        .agg((max(col(c)).cast("double") - min(col(c)).cast("double")).as("s"))
        .agg(avg($"s")).head().getDouble(0)
      spans / g
    }
    val (fo, fp) = (avgSpanFrac("l_orderkey"), avgSpanFrac("l_extendedprice"))
    // a single-column sort gives ~1/16 on its column and ~1.0 on the other;
    // the Z-curve must keep both well under full-span
    assert(fo < 0.55 && fp < 0.55,
      f"z-order failed to cluster both dims: orderkey=$fo%.2f extendedprice=$fp%.2f")
    // layout must not change content
    assert(back.count() == li.count())
  }

  test("rowGroupAudit: flags the 1-row-group layout, passes the well-split one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rgaudit").toString
    try {
      // incompressible ~256 B/row payload (unique hashes) so the parquet
      // files carry real megabytes, not a snappy-collapsed constant
      val payload = repeat(md5($"id".cast("string")), 8).as("p")
      // serial.parquet: ~1 MB in ONE row group (default 128 MB block) —
      // the exact layout that serialized the r11 sf1 corpus scan
      spark.range(20000).select($"id", payload)
        .coalesce(1).write.parquet(s"$dir/serial.parquet")
      // split.parquet: same data, 64 KB row groups — many groups, so the
      // scan can feed every core the split math offers
      spark.range(20000).select($"id", payload)
        .coalesce(1).write.option("parquet.block.size", "65536")
        .option("parquet.page.size", "16384")
        .parquet(s"$dir/split.parquet")
      // dim.parquet: a bare single-file table under one split — serial
      // by nature, nothing to fix
      spark.range(5).select($"id").coalesce(1)
        .write.parquet(s"$dir/_stage")
      val part = new java.io.File(s"$dir/_stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Path.of(dir, "dim.parquet"))
      // hive.parquet: partitioned by k → key=val subdirectories. The
      // audit's one-level listing can't see its leaves; it must surface
      // an explicit skipped row, not silently omit the table (r12 ADVICE)
      spark.range(100).selectExpr("id", "id % 2 AS k")
        .write.partitionBy("k").parquet(s"$dir/hive.parquet")
      // meta.parquet: a flat batch table carrying Spark bookkeeping
      // (_spark_metadata, as a streaming writer leaves behind). Hidden
      // subdirs are NOT hive nesting — the table's data files are flat
      // and must be audited, not skipped (r13 ADVICE)
      spark.range(5).select($"id").coalesce(1)
        .write.parquet(s"$dir/meta.parquet")
      java.nio.file.Files.createDirectory(
        java.nio.file.Path.of(dir, "meta.parquet", "_spark_metadata"))
      // dead.parquet: a dir whose ONLY content is a hidden subdir (a dead
      // write's leftover _temporary) — zero data files. It is neither
      // hive-nested nor auditable; it must surface an explicit
      // no-data-files row, not silently vanish (r14 review pass)
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "dead.parquet", "_temporary"))
      // csvonly.parquet: data files exist but none are parquet (a CSV
      // export landed where a table was expected) — the verdict must
      // say so rather than call the dir empty (r14 ADVICE: 'no data
      // files' could mask a mis-written table as an expected-empty one)
      java.nio.file.Files.createDirectory(
        java.nio.file.Path.of(dir, "csvonly.parquet"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "csvonly.parquet", "part-0.csv"), "a,b\n1,2\n")
      val out = Scale.rowGroupAudit(spark, dir).collect()
        .map(r => r.getAs[String]("table") -> r).toMap
      assert(out.keySet == Set("serial", "split", "dim", "hive", "meta", "dead", "csvonly"))
      assert(out("dead").getAs[String]("verdict") == "skipped: no data files")
      assert(out("dead").isNullAt(out("dead").fieldIndex("n_files")))
      assert(out("csvonly").getAs[String]("verdict") == "skipped: no parquet data files")
      assert(out("csvonly").isNullAt(out("csvonly").fieldIndex("n_files")))
      assert(out("meta").getAs[String]("verdict") == "small")
      assert(out("meta").getAs[Long]("n_rows") == 5L)
      assert(out("hive").getAs[String]("verdict") == "skipped: nested layout")
      assert(out("hive").isNullAt(out("hive").fieldIndex("n_files")))
      assert(out("serial").getAs[Long]("n_rows") == 20000L)
      assert(out("serial").getAs[Long]("n_row_groups") == 1L)
      assert(out("split").getAs[Long]("n_row_groups") > 4L)
      assert(out("dim").getAs[String]("verdict") == "small")
      assert(out("serial").getAs[String]("verdict") == "row_group_bound",
        s"1-row-group MB-scale file must be flagged: ${out("serial")}")
      assert(out("split").getAs[String]("verdict") == "ok", s"${out("split")}")
      // usable parallelism is capped by row groups on the serial table
      assert(out("serial").getAs[Long]("usable_tasks") == 1L)
      assert(out("split").getAs[Long]("usable_tasks") >=
        out("split").getAs[Long]("core_budget"))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("runtime bloom filter semi-prunes the fact side of a filtered dim join") {
    val li = Tables.load(spark, sf, "lineitem")
    val sup = Tables.load(spark, sf, "supplier").filter($"s_acctbal" > 9000)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val bloomed = Scale.withRuntimeBloomJoin(spark) {
        val j = li.join(sup, $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name").agg(count(lit(1)).as("n"))
        val opt = j.queryExecution.optimizedPlan.toString
        assert(opt.contains("might_contain"),
          s"expected an injected runtime bloom filter:\n$opt")
        j.orderBy($"s_name").collect().toSeq
      }
      val plainRows = li.join(sup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("n"))
        .orderBy($"s_name").collect().toSeq
      assert(bloomed == plainRows, "bloom pruning must not change results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }
}
