package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The §7.3 custom-Catalyst ladder, top rung: a whole-operator extension —
  * custom `LogicalPlan` node + planner `Strategy` + physical `SparkPlan` —
  * for the as-of join (reference surface J9; `Relational.asofJoin` is the
  * composed union+window form of the same semantics, kept as the
  * pure-built-in alternative and as this operator's differential oracle).
  *
  * Semantics: for each left row, the single most recent right row of the
  * same key with `rightTs < leftTs` (strict) or `<= leftTs` (inclusive);
  * left rows without one get NULL payload (left-outer as-of). With
  * `forward = true`, the EARLIEST right row with `rightTs > leftTs`
  * (strict) / `>= leftTs` (inclusive) instead — both directions DuckDB's
  * native ASOF JOIN supports, both oracled.
  *
  * Why a physical operator instead of the window form: the union+window
  * plan shuffles AND window-sorts |L|+|R| rows through one partition
  * stream per key, carrying the full left row payload through the sort.
  * This node asks EnsureRequirements for hash co-partitioning on the key
  * and per-partition (key, ts) sort — the SortMergeJoin shape — then
  * streams BOTH sides through a single forward merge pass: O(1) state
  * (one buffered right payload), no pair explosion for dense right
  * streams, no window frame machinery. At 100 TB both sides shuffle once
  * (exactly like SMJ) and nothing else is materialized.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], strict: Boolean,
    forward: Boolean = false) extends BinaryNode {
  // The exec's merge loop picks its accessors/orderings from the LEFT
  // side's types and applies them to right rows too — a silent-garbage
  // hazard if the sides disagree (e.g. TimestampType vs DateType ts, or
  // Long vs Int keys). Fail at plan construction instead.
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types must match: left ${leftKey.dataType.sql} vs " +
      s"right ${rightKey.dataType.sql} — cast one side explicitly")
  require(leftTs.dataType == rightTs.dataType,
    s"as-of join ts types must match: left ${leftTs.dataType.sql} vs " +
      s"right ${rightTs.dataType.sql} — cast one side explicitly")
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] into [[AsofJoinExec]]. Registered per-session by
  * `Graft.enableOptimizations` (live) or `GraftExtensions` (config). */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, payload, strict, forward) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts,
        payload, strict, forward) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children arrive hash-clustered on the key and
  * sorted by (key, ts) — guaranteed by `requiredChildDistribution` /
  * `requiredChildOrdering`, so EnsureRequirements inserts the exchanges
  * and sorts exactly as it would for a SortMergeJoin — and each partition
  * pair merges in one forward pass holding a single buffered right
  * payload. Output preserves the left side's partitioning and ordering,
  * so a downstream per-key operation reuses the exchange. */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute], strict: Boolean,
    forward: Boolean = false) extends BinaryExecNode {

  private def payloadOut: Seq[Attribute] = payload.map(_.withNullability(true))
  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Right-side ordering carries the orderable payload columns as
    * tiebreakers: when several right rows share a (key, ts), the merge
    * loop's pick (last-buffered backward, head-match forward) would
    * otherwise depend on arbitrary partition/sort order. With the
    * tiebreak the result is a pure function of the data — backward ties
    * resolve to the payload-wise MAX row, forward ties to the MIN.
    * Unorderable payload types (map) are skipped; if ALL payloads are
    * unorderable the tie pick remains unspecified (documented on
    * `Relational.asofJoinNative`). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload
        .filterNot(a => a.semanticEquals(rightKey) || a.semanticEquals(rightTs))
        .filter(a => RowOrdering.isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  /** Physical-long accessor for a type whose internal representation is a
    * primitive int/long (the overwhelmingly common as-of shape: integer
    * ids, timestamps, dates). Lets the merge loop compare primitives
    * instead of boxing through an interpreted Ordering per row — measured
    * ~3x on a 600k-row merge. */
  private def physLong(dt: org.apache.spark.sql.types.DataType)
      : Option[(InternalRow, Int) => Long] = dt match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      Some((r, i) => r.getLong(i))
    case org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.DateType =>
      Some((r, i) => r.getInt(i).toLong)
    case _ => None
  }

  /** Typed accessor + comparator + buffering-copy for KEY types whose
    * internal value compares directly without the interpreted-Ordering
    * dispatch: UTF8String (binary compare on the row's bytes, no
    * decode) and Decimal (fixed-precision compareTo). With the ts still
    * primitive (the real as-of shape: string/decimal id + temporal ts),
    * the merge loop then runs the same unboxed skeleton as the
    * primitive path — PERF.md measured the interpreted fallback ~2×
    * slower on a wide string-keyed merge. The copy fn detaches a
    * candidate key from the (reused) right row buffer before it is
    * held across iterations. */
  private def physRef(dt: org.apache.spark.sql.types.DataType): Option[(
      (InternalRow, Int) => AnyRef,
      (AnyRef, AnyRef) => Int,
      AnyRef => AnyRef)] = dt match {
    case org.apache.spark.sql.types.StringType => Some((
      (r, i) => r.getUTF8String(i),
      (a, b) => a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]),
      k => k.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone()))
    case d: org.apache.spark.sql.types.DecimalType => Some((
      (r, i) => r.getDecimal(i, d.precision, d.scale),
      (a, b) => a.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .compare(b.asInstanceOf[org.apache.spark.sql.types.Decimal]),
      identity)) // getDecimal materializes a fresh Decimal already
    case _ => None
  }

  private def ordinalOf(a: Attribute, out: Seq[Attribute]): Int =
    BindReferences.bindReference(a: Expression, out)
      .asInstanceOf[BoundReference].ordinal

  override protected def doExecute(): RDD[InternalRow] = {
    val strictL = strict
    val forwardL = forward
    val payloadL = payload
    val rightOut = right.output
    val outAttrs = output
    val fast = (physLong(leftKey.dataType), physLong(leftTs.dataType)) match {
      case (Some(kGet), Some(tGet)) => Some((kGet, tGet))
      case _ => None
    }
    // string/decimal key + primitive ts: same unboxed merge skeleton,
    // key compared via the type's direct comparator (no interpreted
    // Ordering dispatch, no value boxing per row). The system property
    // is an A/B escape hatch so the typed-vs-interpreted merge delta
    // stays measurable (PERF.md records it); production always takes
    // the typed path.
    val fastRef =
      if (fast.nonEmpty ||
          java.lang.Boolean.getBoolean("graft.asof.interpretedRefKeys")) None
      else (physRef(leftKey.dataType), physLong(leftTs.dataType)) match {
        case (Some((kGet, kCmp, kCopy)), Some(tGet)) =>
          Some((kGet, kCmp, kCopy, tGet))
        case _ => None
      }
    val (lkOrd, ltsOrd) = (ordinalOf(leftKey, left.output), ordinalOf(leftTs, left.output))
    val (rkOrd, rtsOrd) = (ordinalOf(rightKey, right.output), ordinalOf(rightTs, right.output))
    val lkB  = BindReferences.bindReference(leftKey: Expression, left.output)
    val ltsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rkB  = BindReferences.bindReference(rightKey: Expression, right.output)
    val rtsB = BindReferences.bindReference(rightTs: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd  = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payProj = UnsafeProjection.create(payloadL.map(a => a: Expression), rightOut)
      val outProj = UnsafeProjection.create(outAttrs.map(a => a: Expression), outAttrs)
      val joined  = new JoinedRow
      val nullPay = new GenericInternalRow(payloadL.size)
      fast match {
        case Some((kGet, tGet)) =>
          // primitive merge: key/ts live in int/long slots, compared unboxed
          var candSet = false
          var candKeyL = 0L
          var candPay: InternalRow = null
          var nextR: InternalRow = if (rIter.hasNext) rIter.next() else null
          new Iterator[InternalRow] {
            override def hasNext: Boolean = lIter.hasNext
            override def next(): InternalRow = {
              val l = lIter.next()
              if (l.isNullAt(lkOrd) || l.isNullAt(ltsOrd)) {
                // NULL key/ts matches nothing; NULLS FIRST ordering means
                // these lead the partition — nothing to consume yet
                joined(l, nullPay)
              } else {
                val k  = kGet(l, lkOrd)
                val ts = tGet(l, ltsOrd)
                if (forwardL) {
                  // forward: skip rights at-or-before the left position
                  // (never needed again — later lefts are later still);
                  // the head right row of the same key IS the match
                  var continue = nextR != null
                  while (continue) {
                    val skip =
                      if (nextR.isNullAt(rkOrd)) true
                      else {
                        val rk = kGet(nextR, rkOrd)
                        if (rk < k) true
                        else if (rk > k) false
                        else if (nextR.isNullAt(rtsOrd)) true
                        else {
                          val rt = tGet(nextR, rtsOrd)
                          if (strictL) rt <= ts else rt < ts
                        }
                      }
                    if (skip) {
                      nextR = if (rIter.hasNext) rIter.next() else null
                      continue = nextR != null
                    } else continue = false
                  }
                  val m = nextR != null && !nextR.isNullAt(rkOrd) &&
                    kGet(nextR, rkOrd) == k
                  joined(l, if (m) payProj(nextR) else nullPay)
                } else {
                  var continue = nextR != null
                  while (continue) {
                    var record = false
                    val consume =
                      if (nextR.isNullAt(rkOrd)) true
                      else {
                        val rk = kGet(nextR, rkOrd)
                        if (rk < k) true
                        else if (rk > k) false
                        else if (nextR.isNullAt(rtsOrd)) true
                        else {
                          val rt = tGet(nextR, rtsOrd)
                          record = if (strictL) rt < ts else rt <= ts
                          record
                        }
                      }
                    if (consume) {
                      if (record) {
                        candSet = true; candKeyL = kGet(nextR, rkOrd)
                        candPay = payProj(nextR).copy()
                      }
                      nextR = if (rIter.hasNext) rIter.next() else null
                      continue = nextR != null
                    } else continue = false
                  }
                  joined(l, if (candSet && candKeyL == k) candPay else nullPay)
                }
              }
              outProj(joined)
            }
          }
        case None if fastRef.nonEmpty =>
          val (kGet, kCmp, kCopy, tGet) = fastRef.get
          var candSet = false
          var candKey: AnyRef = null
          var candPay: InternalRow = null
          var nextR: InternalRow = if (rIter.hasNext) rIter.next() else null
          new Iterator[InternalRow] {
            override def hasNext: Boolean = lIter.hasNext
            override def next(): InternalRow = {
              val l = lIter.next()
              if (l.isNullAt(lkOrd) || l.isNullAt(ltsOrd)) {
                joined(l, nullPay)
              } else {
                val k  = kGet(l, lkOrd)
                val ts = tGet(l, ltsOrd)
                if (forwardL) {
                  var continue = nextR != null
                  while (continue) {
                    val skip =
                      if (nextR.isNullAt(rkOrd)) true
                      else {
                        val kc = kCmp(kGet(nextR, rkOrd), k)
                        if (kc < 0) true
                        else if (kc > 0) false
                        else if (nextR.isNullAt(rtsOrd)) true
                        else {
                          val rt = tGet(nextR, rtsOrd)
                          if (strictL) rt <= ts else rt < ts
                        }
                      }
                    if (skip) {
                      nextR = if (rIter.hasNext) rIter.next() else null
                      continue = nextR != null
                    } else continue = false
                  }
                  val m = nextR != null && !nextR.isNullAt(rkOrd) &&
                    kCmp(kGet(nextR, rkOrd), k) == 0
                  joined(l, if (m) payProj(nextR) else nullPay)
                } else {
                  var continue = nextR != null
                  while (continue) {
                    var record = false
                    val consume =
                      if (nextR.isNullAt(rkOrd)) true
                      else {
                        val kc = kCmp(kGet(nextR, rkOrd), k)
                        if (kc < 0) true
                        else if (kc > 0) false
                        else if (nextR.isNullAt(rtsOrd)) true
                        else {
                          val rt = tGet(nextR, rtsOrd)
                          record = if (strictL) rt < ts else rt <= ts
                          record
                        }
                      }
                    if (consume) {
                      if (record) {
                        candSet = true
                        // detach the key from the reused right-row buffer
                        candKey = kCopy(kGet(nextR, rkOrd))
                        candPay = payProj(nextR).copy()
                      }
                      nextR = if (rIter.hasNext) rIter.next() else null
                      continue = nextR != null
                    } else continue = false
                  }
                  joined(l,
                    if (candSet && kCmp(candKey, k) == 0) candPay else nullPay)
                }
              }
              outProj(joined)
            }
          }
        case None =>
          // generic merge: interpreted orderings over boxed values
          // (non-primitive ts or exotic key types — rare, still supported)
          var candKey: Any = null
          var candPay: InternalRow = null
          var nextR: InternalRow = if (rIter.hasNext) rIter.next() else null
          new Iterator[InternalRow] {
            override def hasNext: Boolean = lIter.hasNext
            override def next(): InternalRow = {
              val l = lIter.next()
              val k  = lkB.eval(l)
              val ts = ltsB.eval(l)
              if (k == null || ts == null) {
                joined(l, nullPay)
              } else if (forwardL) {
                // forward: skip rights at-or-before the left position;
                // the head right row of the same key is the match
                var continue = nextR != null
                while (continue) {
                  val rkv = rkB.eval(nextR)
                  val skip =
                    if (rkv == null) true
                    else {
                      val kc = keyOrd.compare(rkv, k)
                      if (kc < 0) true
                      else if (kc > 0) false
                      else {
                        val rtv = rtsB.eval(nextR)
                        if (rtv == null) true
                        else {
                          val tc = tsOrd.compare(rtv, ts)
                          if (strictL) tc <= 0 else tc < 0
                        }
                      }
                    }
                  if (skip) {
                    nextR = if (rIter.hasNext) rIter.next() else null
                    continue = nextR != null
                  } else continue = false
                }
                val m = nextR != null && {
                  val rkv = rkB.eval(nextR)
                  rkv != null && keyOrd.compare(rkv, k) == 0
                }
                joined(l, if (m) payProj(nextR) else nullPay)
              } else {
                var continue = nextR != null
                while (continue) {
                  val rkv = rkB.eval(nextR)
                  // consume = at-or-before the current left position;
                  // record = additionally a valid candidate. NULL-keyed /
                  // NULL-ts rows sort first and can never match: consumed,
                  // never recorded — as are rows of an already-passed key.
                  var record = false
                  val consume =
                    if (rkv == null) true
                    else {
                      val kc = keyOrd.compare(rkv, k)
                      if (kc < 0) true
                      else if (kc > 0) false
                      else {
                        val rtv = rtsB.eval(nextR)
                        if (rtv == null) true
                        else {
                          val tc = tsOrd.compare(rtv, ts)
                          record = if (strictL) tc < 0 else tc <= 0
                          record
                        }
                      }
                    }
                  if (consume) {
                    if (record) {
                      candKey = InternalRow.copyValue(rkv)
                      candPay = payProj(nextR).copy()
                    }
                    nextR = if (rIter.hasNext) rIter.next() else null
                    continue = nextR != null
                  } else continue = false
                }
                val matched = candKey != null && keyOrd.compare(candKey, k) == 0
                joined(l, if (matched) candPay else nullPay)
              }
              outProj(joined)
            }
          }
      }
    }
  }
}
