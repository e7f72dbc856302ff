package graft.operators

import graft.model.{RobotsEntry, RobotsRule}

/** robots.txt rule evaluation (north-rule component; the reference has no
  * robots handling — its politeness is the hard-coded `slice(0, 5)` at
  * `scrape-pdfs-from-website/lambda.ts:76-78`).
  *
  * Standard most-specific-match semantics (Google REP, RFC 9309 §2.2.2):
  * the most specific matching rule decides, where specificity is the
  * pattern's length (the REP convention — wildcard and anchor octets count);
  * ties prefer allow; no matching rule or no entry for the host ⇒ allowed.
  *
  * Patterns are matched with FULL `*`/`$` semantics (`*` = any run of
  * octets, trailing `$` anchors the match at the path's end) — a round-3
  * advisor finding showed the previous truncate-at-`*` prefix
  * simplification, safe for Disallow (superset), was UNSAFE for Allow: a
  * truncated Allow prefix matches strictly more paths and, with allow-wins
  * ties, overrode sibling Disallow rules (e.g. `Disallow: /private/` plus
  * an Allow of only the `.html` files under it truncated to Allow
  * `/private/` — fetching everything under /private/).
  *
  * This object is the single spec shared by the Spark side (broadcast-join +
  * expression over the `robots` dimension) and the sequential oracle
  * (`graft.sim.ReferenceSimulator`).
  */
object RobotsMatcher {

  /** REP pattern match: does `pattern` (with `*` wildcards and an optional
    * trailing `$` anchor) match a prefix of `path` (the whole path when
    * anchored)? Plain patterns (the overwhelmingly common case) stay a
    * single startsWith. */
  def matches(pattern: String, path: String): Boolean =
    if (pattern.indexOf('*') < 0 && !pattern.endsWith("$")) path.startsWith(pattern)
    else matchesPattern(pattern, path)

  private def matchesPattern(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // manual '*'-segmentation: String.split("\\*") would Pattern.compile on
    // EVERY call, and this runs per pending row × per wildcard rule inside
    // the scan-side robots filter (round-4 reviewer)
    val segs = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var from = 0
      var star = pat.indexOf('*')
      while (star >= 0) {
        out += pat.substring(from, star)
        from = star + 1
        star = pat.indexOf('*', from)
      }
      out += pat.substring(from) // keeps trailing empty segment for "a*"
      out
    }
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    if (segs.length == 1)
      return !anchored || pos == path.length // no '*': anchored = exact match
    var i = 1
    while (i < segs.length - 1) {
      val s = segs(i)
      if (s.nonEmpty) {
        val idx = path.indexOf(s, pos) // greedy-leftmost is complete for '*'
        if (idx < 0) return false
        pos = idx + s.length
      }
      i += 1
    }
    val last = segs(segs.length - 1)
    if (anchored) path.length - pos >= last.length && path.endsWith(last)
    else last.isEmpty || path.indexOf(last, pos) >= 0
  }

  def allowed(rules: Seq[RobotsRule], path: String): Boolean = {
    if (rules == null || rules.isEmpty) return true
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matches(r.prefix, path)) {
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
