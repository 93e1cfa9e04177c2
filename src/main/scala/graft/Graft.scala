package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.glue
import graft.functions._

/** Library session setup: registers graft's native expressions in the SQL
  * function registry so they compose in `spark.sql` text as well as the
  * Column API. */
object Graft {
  /** Add graft's optimizer rules to a live session (idempotent). The
    * cluster-deployment path is `spark.sql.extensions=graft.plans
    * .GraftExtensions`; this is the same set of rules for sessions built
    * before the library loads. */
  def enableOptimizations(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(graft.plans.RegexPrefixPushdown))
      spark.experimental.extraOptimizations = cur :+ graft.plans.RegexPrefixPushdown
    val strats = spark.experimental.extraStrategies
    if (!strats.exists(_.isInstanceOf[graft.plans.AsofJoinStrategy]))
      spark.experimental.extraStrategies = strats :+ new graft.plans.AsofJoinStrategy
  }

  def registerFunctions(spark: SparkSession): Unit = {
    glue.registerFunction(spark, "simhash64", es => SimHash64(es.head))
    glue.registerFunction(spark, "vec_dot", es => VecDotF32(es(0), es(1)))
    glue.registerFunction(spark, "shingle_words", es =>
      ShingleWords(es(0), es(1).eval().asInstanceOf[Int]))
    glue.registerFunction(spark, "tokenize_words", es => TokenizeWords(es.head))
    glue.registerFunction(spark, "lang_id", es => LangIdExpr(es.head))
  }
}
