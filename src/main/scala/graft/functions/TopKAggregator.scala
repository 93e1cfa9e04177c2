package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A7: custom typed aggregate (the reference exposes no UDAF surface —
  * SQLite's create_function is never surfaced, SURVEY.md §2.9 — so this
  * belongs to the additive scope).
  *
  * Bounded top-k by score inside an aggregation: each partition keeps a
  * k-sized buffer (partial aggregation), merge is bounded merge — so a
  * global "top k per group" costs one shuffle of k-sized states instead
  * of a full window sort of every row. The 100 TB alternative to
  * `row_number().over(...) <= k` when k << group size.
  */
case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def trim(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortBy(x => (-x.score, x.id)).take(k)

  def zero: Seq[ScoredId] = Seq.empty
  def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.size < k || in.score > buf.last.score) trim(buf :+ in) else buf
  def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = trim(a ++ b)
  def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf
  def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
  def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder[Seq[ScoredId]]()
}

/** Bounded BOTTOM-k of (hash, id) pairs under full tuple ordering —
  * [[TopKAggregator]]'s shape (k-sized partial buffers, bounded merge,
  * one shuffle of k-sized states) for [[graft.operators.Sampling]]'s
  * per-stratum deterministic sampler. Ordering is the exact (hash, id)
  * lexicographic order, NOT a Double score: a 52-bit hash collision at
  * the rank-k boundary must break by id identically to the oracle's
  * `ORDER BY hash, id`, and Double ties under TopKAggregator's
  * strict-> reduce would instead keep whichever arrived first
  * (merge-order-dependent). */
class BottomKPairs(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private val ord = Ordering.Tuple2[Long, Long]
  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sorted(ord).take(k)

  def zero: Seq[(Long, Long)] = Seq.empty
  def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size < k || ord.lt(in, buf.last)) trim(buf :+ in) else buf
  def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)
  def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
  def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** `collect_list` with a hard size bound: the buffer never grows past
  * `cap + 1` elements, so a pathological group (an LSH bucket shared by
  * millions of docs) costs bounded executor memory instead of an OOM —
  * and saturation is detectable downstream as `size > cap`. Partial
  * aggregation applies: each map task ships at most cap+1 elements per
  * group. Saturated groups are meant to be DROPPED by the caller
  * (standard LSH hot-bucket capping), so which cap+1 elements survive
  * is irrelevant. The buffer is a Vector so size/append stay O(1)-ish:
  * with a List, every post-saturation row of a hot bucket would pay an
  * O(cap) size scan — exactly the straggler this class exists to
  * prevent. Element type is generic: bare ids (Long) for bucketPairs,
  * (id, fingerprint) pairs for SimHash. */
class CappedCollector[T: scala.reflect.runtime.universe.TypeTag](cap: Int)
    extends Aggregator[T, Seq[T], Seq[T]] {
  def zero: Seq[T] = Vector.empty
  def reduce(buf: Seq[T], in: T): Seq[T] =
    if (buf.size > cap) buf else buf :+ in
  def merge(a: Seq[T], b: Seq[T]): Seq[T] = (a ++ b).take(cap + 1)
  def finish(buf: Seq[T]): Seq[T] = buf
  def bufferEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
  def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}
