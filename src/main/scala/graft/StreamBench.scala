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
        batchSec = p.durationMs.get("triggerExecution").toDouble / 1000.0,
        stateRows = st.map(_.numRowsTotal).getOrElse(0L),
        commitMs = st.map(_.commitTimeMs).getOrElse(0L),
        addBatchMs = p.durationMs.get("addBatch"))
    }

    val runs = (1 to reps).map(once)
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
}
