package graft.operators

import org.apache.spark.sql.DataFrame

/** One pipeline's registered cache releases. Obtained from
  * [[OperatorCaches.scoped]]; operators invoked inside the scope register
  * their persisted frames here instead of in the process-global registry,
  * so concurrent or interleaved pipelines can release their storage
  * independently — calling `release()` on one scope never drops another
  * pipeline's caches or checkpoints.
  */
final class CacheScope private[operators] () {
  private val releases =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  @volatile private var warned = false

  private[operators] def add(f: () => Unit): Unit = {
    releases.add(f)
    if (!warned && releases.size() > OperatorCaches.warnThreshold) {
      warned = true
      OperatorCaches.log.warn(
        s"graft CacheScope holds ${releases.size()} unreleased operator " +
        "caches/checkpoints — a long-lived session should call release() " +
        "after consuming each pipeline's results (see OperatorCaches docs)")
    }
  }

  /** Frames/actions registered and not yet released — tests/monitoring. */
  def trackedCount: Int = releases.size()

  /** Run every registered release in registration order; returns how many
    * ran. Only releases THIS scope's registrations. */
  def release(): Int = {
    var n = 0
    var f = releases.poll()
    while (f != null) { f(); n += 1; f = releases.poll() }
    warned = false
    n
  }
}

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
  *   val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
  *     threshold = 0.7)                // multi-consumer branch: persists
  *   pairs.write.parquet(out)          // consume the result
  *   OperatorCaches.release()          // drop operator-owned caches only
  * }}}
  *
  * (Not every branch caches — e.g. the low-threshold uncapped Jaccard
  * path computes through one reused exchange and registers nothing;
  * calling `release()` after a cache-free pipeline is a harmless no-op.)
  *
  * `release()` is precise where `cacheManager.clearCache()` is blunt: it
  * drops only what graft operators persisted, never the caller's own
  * cached frames. Release AFTER consuming: a later action on a released
  * `persist`-backed result silently recomputes from lineage (correct but
  * slow); a released checkpoint-backed result ([[Dedup.connectedComponents]])
  * cannot recompute — its lineage was truncated — and will fail.
  *
  * '''`release()` is PROCESS-GLOBAL''': it drops every unscoped
  * registration made by any thread since the last release — one pipeline
  * per release cycle. Concurrent or interleaved pipelines in one JVM must
  * isolate themselves with [[scoped]], which hands each pipeline its own
  * [[CacheScope]] to release independently:
  *
  * {{{
  *   val (pairsA, cachesA) = OperatorCaches.scoped {
  *     Dedup.ngramJaccardPairs(docsA, "doc_id", "text")
  *   }
  *   val (pairsB, cachesB) = OperatorCaches.scoped {
  *     Dedup.simhashPairs(docsB, "doc_id", "text", 3)
  *   }
  *   pairsA.write.parquet(outA); cachesA.release()   // B's caches survive
  *   pairsB.write.parquet(outB); cachesB.release()
  * }}}
  *
  * The scope is thread-local for the duration of `body` (operators
  * register eagerly when invoked, so the registrations land in the scope
  * even though the returned frames are lazy). A scope that accumulates
  * more than [[warnThreshold]] unreleased entries logs one warning — the
  * signature of a session that never calls release().
  */
object OperatorCaches {
  private[operators] val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Unreleased-entry count above which a scope logs a one-time warning. */
  val warnThreshold: Int = 64

  private val global = new CacheScope()
  private val current = new ThreadLocal[CacheScope]()

  private def scope: CacheScope = {
    val s = current.get()
    if (s == null) global else s
  }

  /** Run `body` with a fresh [[CacheScope]] installed on this thread;
    * operator cache registrations inside go to that scope instead of the
    * global registry. Returns the body's result and the scope — call
    * `scope.release()` after consuming the result. */
  def scoped[T](body: => T): (T, CacheScope) = {
    val s = new CacheScope()
    val prev = current.get()
    current.set(s)
    try (body, s)
    finally { if (prev == null) current.remove() else current.set(prev) }
  }

  /** Register a persisted frame; returns it for call-site chaining. */
  private[graft] def track(df: DataFrame): DataFrame = {
    scope.add(() => df.unpersist(blocking = false))
    df
  }

  /** Register a custom release action (checkpointed RDDs and other
    * storage not reachable through `Dataset.unpersist`). */
  private[graft] def trackRelease(f: () => Unit): Unit = scope.add(f)

  /** Unscoped frames/actions registered and not yet released. */
  def trackedCount: Int = global.trackedCount

  /** Release every unscoped registration (process-global — see class doc);
    * returns how many ran. */
  def release(): Int = global.release()

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
