package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** Throwaway perf probe (not part of the library surface). */
object ProbeE01 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.streaming.EventStreams
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"TIME $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    s.read.parquet(dir + "/events.parquet").count()
    for (i <- 1 to 3) {
      time(s"e01 run$i") {
        val st = EventStreams.readEventStream(s, dir)
        val q = EventStreams.windowedCounts(st).writeStream
          .outputMode(OutputMode.Complete()).format("memory").queryName("p" + i).start()
        q.processAllAvailable()
        println("BATCHES=" + q.recentProgress.map(p => (p.batchId, p.durationMs)).toList)
        q.stop()
        println("ROWS=" + s.table("p" + i).count())
      }
    }
    s.stop()
  }
}
