package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite anchored-literal-prefix regex filters into
  * `StartsWith`.
  *
  * SQLite GLOB (reference surface, reachable via its SQL entry points —
  * SDF.swift:295-304) lowers to `rlike` in our engine
  * (SQLiteExprs.glob), and a regex predicate is opaque to every data
  * source: it cannot push to the parquet scan, cannot use row-group
  * min/max statistics, and evaluates a java.util.regex Matcher per row.
  * The most common GLOB shape — `prefix*` — is exactly a prefix test,
  * and `StringStartsWith` IS a pushable parquet filter that prunes whole
  * row groups by column statistics. At 100 TB that is the difference
  * between scanning every string page and skipping most of the file.
  *
  * Semantics-preserving by construction:
  *   - `rlike` is search (not full-match), so `^lit` and `^lit.*` are
  *     both exactly "starts with lit" — the `.*` tail matches zero chars
  *     and newline handling never comes into play for a literal prefix
  *   - only patterns whose body is literal characters (or `\`-escaped
  *     regex metacharacters, as SQLiteExprs.globToRegex emits) qualify;
  *     anything with a live metacharacter is left untouched
  *   - `$`-anchored and empty-prefix patterns are left untouched
  */
object RegexPrefixPushdown extends Rule[LogicalPlan] {
  private val Special = "\\.[]{}()<>*+-=!?^$|"

  /** `^lit` or `^lit.*` (lit literal, `\`-escapes allowed) → Some(lit). */
  private[graft] def literalPrefix(p: String): Option[String] = {
    if (!p.startsWith("^")) return None
    val sb = new StringBuilder
    var i = 1
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\') {
        if (i + 1 >= p.length) return None
        val n = p.charAt(i + 1)
        if (Special.indexOf(n.toInt) < 0) return None // \d, \w, … — a class, bail
        sb.append(n); i += 2
      } else if (c == '.') {
        // only legal as the trailing ".*"
        return if (i == p.length - 2 && p.charAt(i + 1) == '*') Some(sb.toString)
               else None
      } else if (Special.indexOf(c.toInt) >= 0) {
        return None
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case rl @ RLike(child, Literal(p: UTF8String, StringType)) =>
      literalPrefix(p.toString) match {
        case Some(pre) if pre.nonEmpty => StartsWith(child, Literal(pre))
        case _ => rl
      }
  }
}
