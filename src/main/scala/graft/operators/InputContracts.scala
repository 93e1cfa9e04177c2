package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{CurrentDate, CurrentTimestamp, Expression, LocalTimestamp, Now, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Shared input contracts for multi-consumer operator builders.
  *
  * Several builders ([[Dedup.dedupMinHashPairsFrom]],
  * [[Dedup.ngramJaccardPairsFrom]], [[Dedup.cosineNearDupLSH]],
  * [[Dedup.ngramJaccardIncremental]], [[Dedup.connectedComponents]],
  * [[TextOps.tfidfTopTerms]]) evaluate their input frame's lineage from
  * MORE THAN ONE plan subtree or Spark job (self-join legs, a
  * signature leg plus verify joins, a df aggregation plus a tf join
  * leg, fixpoint rounds). A non-deterministic input — `rand()` sampling,
  * `monotonically_increasing_id`, `uuid()`, a per-execution timestamp —
  * can then yield a DIFFERENT row set per consumer, which corrupts
  * results silently (e.g. idf weights computed over different rows than
  * the tf entries they scale). This was previously a per-operator doc
  * caveat; one shared assertion keeps the semantics from fragmenting
  * (r11 verdict #4).
  *
  * The remedy for a genuinely random input is to `persist()` (or
  * checkpoint) it first: a cached lineage materializes once however
  * many consumers read it. The check honors that by walking
  * `withCachedData`, where any persisted fragment has been substituted
  * by a leaf `InMemoryRelation` — taint below a caller's persist() is
  * out of scope by construction.
  */
object InputContracts {

  /** Throws `IllegalArgumentException` if `df`'s (cache-substituted)
    * lineage contains evaluation-time non-determinism; returns `df`
    * unchanged otherwise. Pure plan walk — runs no job.
    *
    * Two classes are rejected:
    *  - expressions Catalyst itself marks non-deterministic (`rand`,
    *    `uuid`, `shuffle`, `monotonically_increasing_id`,
    *    `spark_partition_id`, non-deterministic UDFs, ...);
    *  - current-time literals (`current_timestamp`, `now`,
    *    `current_date`, `localtimestamp`). Catalyst flags these
    *    deterministic because ComputeCurrentTime pins one value per
    *    query EXECUTION — but a multi-consumer builder may run several
    *    executions over the same lineage (count-first job splits,
    *    fixpoint rounds), each re-pinning a different instant.
    *
    * NOT rejected (and not reliably detectable from the plan): an
    * unordered `limit`/file-order dependence, which is deterministic
    * for a fixed set of input files but not across corpus rewrites —
    * that part of the contract stays with the caller. */
  def requireDeterministic(df: DataFrame, operator: String): DataFrame = {
    // fresh substitution, not queryExecution.withCachedData: that lazy
    // val freezes at first access, so a persist() applied after an
    // earlier plan inspection would be invisible through it
    val offending =
      offendingIn(org.apache.spark.sql.graft.glue.withCachedData(df))
    require(offending.isEmpty,
      s"$operator: input lineage contains non-deterministic expressions " +
        s"(${offending.map(_.sql).distinct.take(3).mkString(", ")}) but is " +
        "evaluated from multiple consumers/jobs — each evaluation could see " +
        "a different row set. persist() or checkpoint the frame first so it " +
        "materializes once.")
    df
  }

  /** Offending expressions anywhere in `plan`, INCLUDING inside
    * subquery-expression plans (scalar/IN/EXISTS/lateral): Catalyst
    * marks a `SubqueryExpression` deterministic from its outer-reference
    * children only, so a `rand()` buried in a scalar subquery is
    * invisible to a flat walk — yet the subquery re-executes (and
    * re-draws) per query execution, exactly the multi-consumer hazard
    * (r12 review pass). Note the cache substitution is applied to the
    * OUTER plan only; a caller persisting a fragment inside a subquery
    * should materialize the subquery result outside it instead. */
  private def offendingIn(plan: LogicalPlan): Seq[Expression] =
    plan.collect { case node =>
      node.expressions.flatMap(_.collect {
        case e: Expression
            if !e.deterministic && e.children.forall(_.deterministic) => Seq(e)
        case e @ (_: CurrentTimestamp | _: Now | _: CurrentDate |
            _: LocalTimestamp) => Seq(e)
        case s: SubqueryExpression => offendingIn(s.plan)
      }.flatten)
    }.flatten
}
