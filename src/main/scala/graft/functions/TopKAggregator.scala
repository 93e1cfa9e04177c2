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

/** The shared bounded-k machinery under an explicit TOTAL order: each
  * partition keeps the k smallest elements by `ord` (partial
  * aggregation), merge is bounded merge. The order must be total and
  * must match the oracle's ORDER BY exactly — a boundary tie under a
  * partial order (the original TopKAggregator compared score alone)
  * keeps whichever element arrived first, i.e. merge-order-dependent
  * output. Instances pick the order; the encoders come from the
  * element TypeTag (the CappedCollector pattern). */
abstract class BoundedKAggregator[T: scala.reflect.runtime.universe.TypeTag](
    k: Int, ord: Ordering[T])
    extends Aggregator[T, Seq[T], Seq[T]] {

  private def trim(s: Seq[T]): Seq[T] = s.sorted(ord).take(k)

  def zero: Seq[T] = Seq.empty
  def reduce(buf: Seq[T], in: T): Seq[T] =
    if (buf.size < k || ord.lt(in, buf.last)) trim(buf :+ in) else buf
  def merge(a: Seq[T], b: Seq[T]): Seq[T] = trim(a ++ b)
  def finish(buf: Seq[T]): Seq[T] = buf
  def bufferEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
  def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}

/** Top-k by score, ids ascending within a score — the (−score, id)
  * instance. The tuple order makes the rank-k boundary DETERMINISTIC
  * under score ties (matching s03's oracle `ORDER BY price DESC, id`);
  * the pre-r15 reduce compared score alone and kept the first arrival. */
class TopKAggregator(k: Int)
    extends BoundedKAggregator[ScoredId](
      k, Ordering.by((x: ScoredId) => (-x.score, x.id)))

/** Bottom-k of (hash, id) pairs under exact tuple ordering — for
  * [[graft.operators.Sampling]]'s per-stratum deterministic sampler. A
  * 52-bit hash collision at the rank-k boundary breaks by id exactly
  * like the oracle's `ORDER BY hash, id`; no Double score is involved,
  * so no precision or tie ambiguity exists. */
class BottomKPairs(k: Int)
    extends BoundedKAggregator[(Long, Long)](k, Ordering.Tuple2[Long, Long])

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
