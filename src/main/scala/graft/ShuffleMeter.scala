package graft

import org.apache.spark.SparkContext

/** Shared shuffle-write-record instrument for the probe mains and the
  * ingest specs (one definition instead of the three copies a review
  * pass found drifting): a continuous counter fed by a SparkListener,
  * read through an async-bus quiesce so a measurement window never
  * closes while task-end events are still in flight. */
final class ShuffleMeter(sc: SparkContext) {
  private val recs = new java.util.concurrent.atomic.AtomicLong(0)
  private val listener = new org.apache.spark.scheduler.SparkListener {
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      ()
    }
  }
  sc.addSparkListener(listener)

  /** Poll until the async listener bus has drained (count stable for
    * ~0.5 s, 30 s deadline); returns the cumulative record count. */
  def quiesce(): Long = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var prev = -1L
    var stable = 0
    while (stable < 5 && System.nanoTime() < deadline) {
      val c = recs.get()
      if (c == prev) stable += 1 else { stable = 0; prev = c }
      Thread.sleep(100)
    }
    recs.get()
  }

  def remove(): Unit = sc.removeSparkListener(listener)
}

object ShuffleMeter {
  /** Shuffle records written while `body` runs (quiesced both sides). */
  def recordsDuring(sc: SparkContext)(body: => Unit): Long = {
    val m = new ShuffleMeter(sc)
    try {
      val before = m.quiesce()
      body
      m.quiesce() - before
    } finally m.remove()
  }
}
