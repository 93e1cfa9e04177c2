package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** `spark.sql.extensions` entry point — the deployment path for a real
  * cluster, where the session is built by the platform and the library
  * only gets a config slot:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  * }}}
  *
  * Injects the graft optimizer rules and planner strategies into every
  * session built with the extension. For a session that already exists
  * (tests, notebooks), use [[graft.Graft.enableOptimizations]] instead —
  * same rules, live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RegexPrefixPushdown)
    ext.injectOptimizerRule(_ => SmallResultSort)
    ext.injectPlannerStrategy(_ => new AsofJoinStrategy)
  }
}
