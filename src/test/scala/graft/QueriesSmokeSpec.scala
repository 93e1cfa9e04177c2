package graft

/** Every registered query must execute at sf0.001 — guards refactors
  * between driver verify runs (which happen only at round boundaries).
  * Correctness-vs-oracle lives in scripts/selfcheck.py; this is the
  * executability gate. */
class QueriesSmokeSpec extends SparkSpec {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      df.count() // must not throw; empty results are legal for some ops
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
