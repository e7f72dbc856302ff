package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CanonicalizeUrl, CanonicalUrlHash}

/** Optimizer rule: URL canonicalization is idempotent (property-tested in
  * UrlCanonicalizerSpec) and [[CanonicalUrlHash]] canonicalizes internally,
  * so stacked canonicalizations collapse:
  *
  *   url_hash64(canonicalize_url(x))      ==> url_hash64(x)
  *   canonicalize_url(canonicalize_url(x)) ==> canonicalize_url(x)
  *
  * This pattern arises naturally when pipeline stages defensively
  * canonicalize their inputs (e.g. the CrawlDriver's discovery stage hashes
  * a link AND stores its canonical form; a downstream consumer re-hashing
  * the stored form would otherwise pay a second full canonicalization per
  * row — string allocation + query-param sort — inside the hot dedup path).
  */
object CollapseCanonicalization extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CanonicalUrlHash(CanonicalizeUrl(child)) => CanonicalUrlHash(child)
    case CanonicalizeUrl(CanonicalizeUrl(child)) => CanonicalizeUrl(child)
  }
}

/** Session extension entry point:
  * {{{
  * SparkSession.builder().withExtensions(new GraftSparkExtensions)...
  * // or: --conf spark.sql.extensions=graft.plans.GraftSparkExtensions
  * }}}
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CollapseCanonicalization)
  }
}
