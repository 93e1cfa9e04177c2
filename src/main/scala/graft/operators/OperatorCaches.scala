package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of the intermediate frames graft operators persist — the
  * explicit release contract for library users in long-lived sessions.
  *
  * Several operators cache a frame that more than one pass of their own
  * plan reads (shingle frames, capped inverted indexes, LSH signature
  * frames, the k-means corpus, the range-sorted rowid frame). The cache
  * cannot be dropped inside the operator — the returned frame is lazy and
  * still reads it — so each such persist registers itself here and the
  * caller releases them all once the results are consumed:
  *
  * {{{
  *   val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
  *   pairs.write.parquet(out)          // consume the result
  *   OperatorCaches.release()          // drop operator-owned caches only
  * }}}
  *
  * `release()` is precise where `cacheManager.clearCache()` is blunt: it
  * drops only what graft operators persisted, never the caller's own
  * cached frames. Release AFTER consuming: a later action on a released
  * `persist`-backed result silently recomputes from lineage (correct but
  * slow); a released checkpoint-backed result ([[Dedup.connectedComponents]])
  * cannot recompute — its lineage was truncated — and will fail.
  * Thread-safe; releases in registration order.
  */
object OperatorCaches {
  private val releases =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a persisted frame; returns it for call-site chaining. */
  private[graft] def track(df: DataFrame): DataFrame = {
    releases.add(() => df.unpersist(blocking = false))
    df
  }

  /** Register a custom release action (checkpointed RDDs and other
    * storage not reachable through `Dataset.unpersist`). */
  private[graft] def trackRelease(f: () => Unit): Unit = releases.add(f)

  /** Frames/actions registered and not yet released — tests/monitoring. */
  def trackedCount: Int = releases.size()

  /** Run every registered release; returns how many ran. */
  def release(): Int = {
    var n = 0
    var f = releases.poll()
    while (f != null) { f(); n += 1; f = releases.poll() }
    n
  }

  /** Unpersist the block-manager storage behind a `localCheckpoint`ed
    * frame. `Dataset.unpersist` only talks to the CacheManager and never
    * touches these blocks; the RDD handle lives in the checkpoint's
    * `LogicalRDD` leaf. Only call once the frame (and everything derived
    * from it that has not itself been checkpointed) is fully consumed —
    * local checkpoints have no lineage to recompute from. */
  private[graft] def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
}
