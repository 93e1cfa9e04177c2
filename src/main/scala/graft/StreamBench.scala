package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-throughput measurement (not a correctness query): pushes the
  * whole events table through [[graft.streaming.EventStreams.windowedCounts]]
  * as ONE micro-batch and reports events/sec plus the state-store commit
  * cost from the engine's own StreamingQueryProgress. The e-block bench
  * queries time the micro-batch FLOOR (planning + one small batch); this
  * pins the sustained-rate number a 100 TB pipeline claim needs.
  *
  * Prints one JSON line:
  * {"metric":"stream_throughput","events":N,"batch_sec":S,
  *  "events_per_sec":R,"state_rows":K,"state_commit_ms":C,
  *  "add_batch_ms":MS,"runs":[...per-run events_per_sec...]}
  *
  * Runs the query `reps` times (fresh state each run — a new memory sink
  * and checkpoint per run) and reports the BEST run as the sustained
  * rate: the first run pays whole-stage codegen + state-store provider
  * init, which a long-running stream amortizes to zero.
  *
  * SPARK_GRAFT_STREAM_MODE=sustained switches to the multi-batch shape
  * (r9 verdict #4): the events table is split into SPARK_GRAFT_BATCHES
  * ts-ranged files with staggered mtimes, streamed one file per trigger
  * (`maxFilesPerTrigger=1`) through the same windowed aggregate in
  * APPEND mode — so the watermark advances batch-over-batch and state
  * rows are actually evicted, the steady-state a long-running pipeline
  * lives in. Reports per-batch rate / commit-ms / state rows and a
  * steady-state rate = median over the post-warmup batches (first two
  * excluded: they pay codegen + provider init).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    // SPARK_GRAFT_STATE_STORE=rocksdb swaps in the RocksDB provider —
    // the production choice once state outgrows the executor heap (the
    // default HDFS-backed store keeps every version in memory).
    val store = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (store == "rocksdb") builder.config(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.EventStreams

    if (sys.env.get("SPARK_GRAFT_STREAM_MODE").contains("sustained")) {
      sustained(spark, sfDir, store)
      try spark.stop() catch { case _: Throwable => () }
      return
    }
    if (sys.env.get("SPARK_GRAFT_STREAM_MODE").contains("crossover")) {
      crossover(spark, store)
      try spark.stop() catch { case _: Throwable => () }
      return
    }

    case class Run(events: Long, batchSec: Double, stateRows: Long,
        commitMs: Long, addBatchMs: Long)

    def once(i: Int): Run = {
      val name = s"sb_out_$i"
      val q = EventStreams.windowedCounts(
          EventStreams.readEventStream(spark, sfDir))
        .writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName(name).start()
      q.processAllAvailable()
      // the data batch is the progress entry that actually saw input
      // (a trailing zero-row batch may fire to finalize the watermark)
      val p = q.recentProgress.maxBy(_.numInputRows)
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val st = p.stateOperators.headOption
      Run(
        events = p.numInputRows,
        // 1 ms floor: a 0 ms trigger on a toy corpus → Infinity rate →
        // NumberFormatException in the JSON formatting
        batchSec = math.max(p.durationMs.get("triggerExecution").toDouble, 1.0) / 1000.0,
        stateRows = st.map(_.numRowsTotal).getOrElse(0L),
        commitMs = st.map(_.commitTimeMs).getOrElse(0L),
        addBatchMs = p.durationMs.get("addBatch"))
    }

    // close native RocksDB instances before JVM exit even when a run
    // throws — exiting with them open reproduces the JNI logger SIGSEGV
    // this call exists to prevent (r11 review pass)
    val runs =
      try (1 to reps).map(once)
      finally org.apache.spark.sql.graft.glue.stopStateStores()
    val best = runs.minBy(_.batchSec)
    def ms(v: Double): String =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    val perRun = runs.map(r => ms(r.events / r.batchSec)).mkString("[", ",", "]")
    val out =
      s"""{"metric":"stream_throughput","events":${best.events},""" +
      s""""batch_sec":${ms(best.batchSec)},""" +
      s""""events_per_sec":${ms(best.events / best.batchSec)},""" +
      s""""state_rows":${best.stateRows},""" +
      s""""state_commit_ms":${best.commitMs},""" +
      s""""add_batch_ms":${best.addBatchMs},""" +
      s""""runs":$perRun,"state_store":"$store","sf":"$sfDir","cpus":$cpus}"""
    try spark.stop() catch { case _: Throwable => () }
    println(out)
    System.out.flush()
  }

  /** Multi-batch steady-state measurement: N ts-ranged files, one per
    * trigger, windowed aggregate in Append mode (watermark advances and
    * evicts state between batches — the long-running-pipeline regime).
    * Prints one JSON line with per-batch series and the post-warmup
    * median rate. */
  private def sustained(spark: SparkSession, sfDir: String, store: String): Unit = {
    import org.apache.spark.sql.functions.col
    import java.nio.file.Files
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt

    // the per-batch series is read back from recentProgress, whose ring
    // buffer defaults to 100 entries — size it to the run or a long
    // sweep silently loses its warmup batches and undercounts events
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (nBatches + 10).toString)

    // split the events table into nBatches contiguous ts ranges, one
    // parquet file each — range partitioning keeps every batch a
    // time-ordered slice, exactly how a tailed event log arrives
    val splitDir = Files.createTempDirectory("graft-sustained").toString
    try {
      Tables.load(spark, sfDir, "events")
        .repartitionByRange(nBatches, col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(splitDir)
      // stagger mtimes in ts order: the file source orders new files by
      // modification time, and all parts land within the same clock tick
      val parts = new java.io.File(splitDir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      val t0 = System.currentTimeMillis() - parts.length * 2000L
      parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }

      // same probe-then-bind shape as EventStreams.readEventStream, over
      // the split layout (part-file names, so no events.parquet glob)
      val physical = spark.read.parquet(splitDir).schema
      val src = Tables.normalize(
        spark.readStream.schema(physical)
          .option("maxFilesPerTrigger", "1")
          .parquet(splitDir))
      // the SAME aggregate the e-block times, keyed on the window struct
      // (Append mode needs the event-time column among the grouping keys)
      val agg = graft.streaming.EventStreams.windowedCounts(src, groupByStruct = true)
      val q = agg.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .format("memory").queryName("sb_sustained").start()
      q.processAllAvailable()
      // data batches only (a trailing zero-row batch finalizes the watermark)
      val prog = q.recentProgress.filter(_.numInputRows > 0).toSeq
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sb_sustained")
      report(prog, store, sfDir)
    } finally {
      // in the finally: a failed stream must still close the native
      // RocksDB instances or JVM exit hits the JNI logger SIGSEGV
      org.apache.spark.sql.graft.glue.stopStateStores()
      deleteRecursively(new java.io.File(splitDir))
    }
  }

  /** State-store crossover measurement (r10 verdict #5): the provider
    * rule "in-heap HDFS store until state outgrows the heap" was
    * extrapolated from tiny state (≤3600 rows) — this mode MEASURES the
    * curve. A synthetic high-cardinality stream grows an unevicted
    * per-key aggregate by SPARK_GRAFT_KEYS_PER_BATCH brand-new keys per
    * trigger for SPARK_GRAFT_BATCHES triggers (no watermark, Update mode,
    * noop sink — nothing is retained but the state itself), so ONE run
    * yields per-batch (state_rows, batch_sec, commit_ms, state_mem_bytes)
    * out to rows = batches × keysPerBatch. Run once with
    * SPARK_GRAFT_STATE_STORE=hdfs and once with rocksdb; where the curves
    * cross is the provider switch point for this heap size.
    *
    * The stream is genuinely distributed: keys hash-shuffle to
    * `cpus` state-store partitions exactly like a production per-session
    * aggregate; only the progress metrics reach the driver. */
  private def crossover(spark: SparkSession, store: String): Unit = {
    import org.apache.spark.sql.functions._
    import java.nio.file.{Files, Path}
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "16").toInt
    val keysPerBatch = sys.env.getOrElse("SPARK_GRAFT_KEYS_PER_BATCH", "1000000").toLong
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (nBatches + 10).toString)
    val splitDir = Files.createTempDirectory("graft-crossover").toString
    try {
      // batch i carries keys [i*K, (i+1)*K) — every key brand new, so
      // total state after batch i is exactly (i+1)*K rows; a long value
      // column makes the state row the (key, count, sum) shape of a real
      // per-session aggregate
      (0 until nBatches).foreach { i =>
        val staging = s"$splitDir/_staging"
        spark.range(i * keysPerBatch, (i + 1) * keysPerBatch)
          .select(col("id").as("key"), (col("id") % 997).as("value"))
          .coalesce(1).write.mode("overwrite").parquet(staging)
        val part = new java.io.File(staging).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        // %05d: lexicographic name order must equal batch order for the
        // mtime stagger below — %03d would scramble past 999 batches
        Files.move(part.toPath, Path.of(splitDir, f"b$i%05d.parquet"))
      }
      deleteRecursively(new java.io.File(s"$splitDir/_staging"))
      val parts = new java.io.File(splitDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val t0 = System.currentTimeMillis() - parts.length * 2000L
      parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(t0 + i * 2000L) }

      val physical = spark.read.parquet(splitDir).schema
      val src = spark.readStream.schema(physical)
        .option("maxFilesPerTrigger", "1").parquet(splitDir)
      // unevicted per-key running aggregate — state is one row per key,
      // exactly the unbounded-session shape the provider rule is about
      val agg = src.groupBy(col("key"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      val q = agg.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .format("noop").start()
      q.processAllAvailable()
      val prog = q.recentProgress.filter(_.numInputRows > 0).toSeq
      q.stop()
      def ms(v: Double): String =
        BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
      val rows = prog.map(_.stateOperators.headOption.map(_.numRowsTotal).getOrElse(0L))
      val secs = prog.map(p =>
        math.max(p.durationMs.get("triggerExecution").toDouble, 1.0) / 1000.0)
      val commits = prog.map(_.stateOperators.headOption.map(_.commitTimeMs).getOrElse(0L))
      val mem = prog.map(_.stateOperators.headOption.map(_.memoryUsedBytes).getOrElse(0L))
      val out =
        s"""{"metric":"state_crossover","batches":${prog.size},""" +
        s""""keys_per_batch":$keysPerBatch,""" +
        s""""state_rows":${rows.mkString("[", ",", "]")},""" +
        s""""batch_sec":${secs.map(ms).mkString("[", ",", "]")},""" +
        s""""commit_ms":${commits.mkString("[", ",", "]")},""" +
        s""""state_mem_bytes":${mem.mkString("[", ",", "]")},""" +
        // the JVM's ACTUAL max heap, not an env var that may not have
        // reached the forked process — the provider rule derived from
        // this curve is stated as a fraction of the heap
        s""""state_store":"$store","heap_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)}}"""
      println(out)
      System.out.flush()
    } finally {
      // in the finally: a failed stream must still close the native
      // RocksDB instances or JVM exit hits the JNI logger SIGSEGV
      org.apache.spark.sql.graft.glue.stopStateStores()
      deleteRecursively(new java.io.File(splitDir))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  private def report(prog: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress],
      store: String, sfDir: String): Unit = {
    def ms(v: Double): String =
      BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    case class B(events: Long, sec: Double, rate: Double, commitMs: Long,
        stateRows: Long, removed: Long)
    val batches = prog.map { p =>
      val st = p.stateOperators.headOption
      // floor at 1 ms: a sub-millisecond trigger on a toy corpus reports
      // 0 ms and an Infinity rate would crash the JSON formatting
      val sec = math.max(p.durationMs.get("triggerExecution").toDouble, 1.0) / 1000.0
      B(p.numInputRows, sec, p.numInputRows / sec,
        st.map(_.commitTimeMs).getOrElse(0L),
        st.map(_.numRowsTotal).getOrElse(0L),
        st.map(_.numRowsRemoved).getOrElse(0L))
    }
    // steady state: skip the first two batches (codegen + provider init)
    val steady = batches.drop(2)
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else xs.sorted.apply((xs.size - 1) / 2)
    val out =
      s"""{"metric":"stream_sustained","batches":${batches.size},""" +
      s""""events":${batches.map(_.events).sum},""" +
      s""""steady_events_per_sec":${ms(median(steady.map(_.rate)))},""" +
      s""""steady_commit_ms":${ms(median(steady.map(_.commitMs.toDouble)))},""" +
      s""""rates":${batches.map(b => ms(b.rate)).mkString("[", ",", "]")},""" +
      s""""batch_sec":${batches.map(b => ms(b.sec)).mkString("[", ",", "]")},""" +
      s""""commit_ms":${batches.map(_.commitMs).mkString("[", ",", "]")},""" +
      s""""state_rows":${batches.map(_.stateRows).mkString("[", ",", "]")},""" +
      s""""rows_removed":${batches.map(_.removed).mkString("[", ",", "]")},""" +
      s""""state_store":"$store","sf":"$sfDir"}"""
    println(out)
    System.out.flush()
  }
}
