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

/** `collect_list` with a hard size bound: the buffer never grows past
  * `cap + 1` elements, so a pathological group (an LSH bucket shared by
  * millions of docs) costs bounded executor memory instead of an OOM —
  * and saturation is detectable downstream as `size > cap`. Partial
  * aggregation applies: each map task ships at most cap+1 ids per group.
  * Saturated groups are meant to be DROPPED by the caller (standard LSH
  * hot-bucket capping), so which cap+1 ids survive is irrelevant. */
class CappedIdsAggregator(cap: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  def zero: Seq[Long] = Seq.empty
  def reduce(buf: Seq[Long], in: Long): Seq[Long] =
    if (buf.size > cap) buf else buf :+ in
  def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = (a ++ b).take(cap + 1)
  def finish(buf: Seq[Long]): Seq[Long] = buf
  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** [[CappedIdsAggregator]] for (id, payload) pairs whose payload is one
  * long (a SimHash fingerprint) — light enough to ride the candidate
  * shuffle. Heavy payloads (embedding vectors) should instead join back
  * by id after candidate generation. */
class CappedLongPairsAggregator(cap: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  def zero: Seq[(Long, Long)] = Seq.empty
  def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size > cap) buf else buf :+ in
  def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).take(cap + 1)
  def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf
  def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder[Seq[(Long, Long)]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder[Seq[(Long, Long)]]()
}
