package graft

import org.apache.spark.sql.functions._

class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset views decode with compile-time field checks") {
    val li = Typed.lineitems(spark, sf)
    val r = li.filter(_.l_quantity > 45)
      .map(x => (x.l_returnflag, x.l_quantity))
      .groupByKey(_._1).count()
      .collect().toMap
    val expect = Tables.load(spark, sf, "lineitem")
      .filter($"l_quantity" > 45).groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(r == expect)
  }

  test("typed documents compose with untyped operators") {
    val docs = Typed.documents(spark, sf)
    val n = docs.filter(_.n_chars > 100).count()
    assert(n > 0)
    // typed -> untyped boundary: operators accept the underlying DataFrame
    val stats = graft.operators.Dedup.exactDupStats(docs.toDF(), "text")
    assert(stats.head().getLong(0) == docs.count())
  }

  test("approx_count_distinct (HLL) lands within 5% of exact at sf0.001") {
    val li = Tables.load(spark, sf, "lineitem")
    val Row = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey").as("approx")).head()
    val (exact, approx) = (Row.getLong(0), Row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"HLL estimate $approx vs exact $exact")
  }
}
