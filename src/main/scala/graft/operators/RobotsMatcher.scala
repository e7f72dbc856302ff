package graft.operators

import graft.model.{RobotsEntry, RobotsRule}

/** robots.txt rule evaluation (north-rule component; the reference has no
  * robots handling — its politeness is the hard-coded `slice(0, 5)` at
  * `scrape-pdfs-from-website/lambda.ts:76-78`).
  *
  * Standard longest-prefix-match semantics (Google REP, RFC 9309 §2.2.2):
  * the most specific (longest) matching prefix rule decides; ties prefer
  * allow; no matching rule or no entry for the host ⇒ allowed.
  *
  * This object is the single spec shared by the Spark side (broadcast-join +
  * expression over the `robots` dimension) and the sequential oracle
  * (`graft.sim.ReferenceSimulator`).
  */
object RobotsMatcher {

  def allowed(rules: Seq[RobotsRule], path: String): Boolean = {
    if (rules == null || rules.isEmpty) return true
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (path.startsWith(r.prefix)) {
        val len = r.prefix.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** Path+query component of an absolute URL ("/" when absent). */
  def pathOf(url: String): String = {
    val i = url.indexOf("://")
    if (i <= 0) return url
    val slash = url.indexOf('/', i + 3)
    if (slash < 0) "/" else url.substring(slash)
  }

  def allowedUrl(entries: Map[String, RobotsEntry], host: String, url: String): Boolean =
    entries.get(host) match {
      case None    => true
      case Some(e) => allowed(e.rules, pathOf(url))
    }
}
