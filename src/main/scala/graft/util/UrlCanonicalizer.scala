package graft.util

/** Deterministic URL canonicalization for the 64-bit `url_hash` identity.
  *
  * Generalizes the reference's URL identity, which was simply
  * `downloadUrl.split("DocumentId=").pop()` (`scrape-pdfs-from-website/
  * lambda.ts:81-83`) — fine for one site, useless at 10^10-URL scale.
  * The canonical form is the dedup key, so the rules are intentionally
  * conservative (never merge two genuinely different resources):
  *
  *  1. scheme and host lowercased;
  *  2. default port stripped (`:80` for http, `:443` for https);
  *  3. fragment stripped (never sent to the server);
  *  4. query parameters sorted by (key, value), preserving each `k=v` /
  *     bare-`k` token byte-for-byte otherwise; empty query (`?`) dropped;
  *  5. empty path becomes `/`;
  *  6. everything else (percent-encoding, trailing slashes, path dots) is
  *     preserved as-is.
  *
  * Pure string processing — no java.net.URL (which does DNS in equals()!)
  * and no exceptions: malformed input canonicalizes to itself trimmed,
  * so the pipeline never throws on crawl garbage.
  */
object UrlCanonicalizer {

  def canonicalize(raw: String): String = {
    if (raw == null) return ""
    val url = JsText.jsTrim(raw)
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return url // not absolute: canonical form is itself
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)

    val rest0 = url.substring(schemeEnd + 3)
    // strip fragment first
    val hashIdx = rest0.indexOf('#')
    val rest = if (hashIdx >= 0) rest0.substring(0, hashIdx) else rest0

    val pathStart = {
      val slash = rest.indexOf('/')
      val q = rest.indexOf('?')
      if (slash < 0 && q < 0) rest.length
      else if (slash < 0) q
      else if (q < 0) slash
      else math.min(slash, q)
    }
    var authority = rest.substring(0, pathStart)
    var pathQuery = rest.substring(pathStart)

    // lowercase host, strip default port (keep userinfo untouched if present)
    val atIdx = authority.lastIndexOf('@')
    val userinfo = if (atIdx >= 0) authority.substring(0, atIdx + 1) else ""
    var hostPort = if (atIdx >= 0) authority.substring(atIdx + 1) else authority
    hostPort = hostPort.toLowerCase(java.util.Locale.ROOT)
    val defaultPort = if (scheme == "http") ":80" else if (scheme == "https") ":443" else null
    if (defaultPort != null && hostPort.endsWith(defaultPort))
      hostPort = hostPort.substring(0, hostPort.length - defaultPort.length)
    authority = userinfo + hostPort

    // split path / query; sort query params
    val qIdx = pathQuery.indexOf('?')
    var path = if (qIdx >= 0) pathQuery.substring(0, qIdx) else pathQuery
    val query = if (qIdx >= 0) pathQuery.substring(qIdx + 1) else null
    if (path.isEmpty) path = "/"
    val canonQuery =
      if (query == null || query.isEmpty) ""
      else {
        val parts = query.split("&", -1).filter(_.nonEmpty)
        if (parts.isEmpty) ""
        // strict comparator: `av <= bv` made compare(x,x) inconsistent and
        // TimSort (arrays >= 32 elements) throws "Comparison method violates
        // its general contract!" on many duplicate params — a crawl-garbage
        // URL must never crash the codegen'd expression (round-1 advisor)
        else "?" + parts.sortInPlaceWith { (a, b) =>
          val (ak, av) = splitKv(a); val (bk, bv) = splitKv(b)
          if (ak != bk) ak < bk else av < bv
        }.mkString("&")
      }
    scheme + "://" + authority + path + canonQuery
  }

  @inline private def splitKv(tok: String): (String, String) = {
    val i = tok.indexOf('=')
    if (i < 0) (tok, "") else (tok.substring(0, i), tok.substring(i + 1))
  }

  /** Host component of a canonical URL ("" when not absolute). */
  def host(canonicalUrl: String): String = {
    val i = canonicalUrl.indexOf("://")
    if (i <= 0) return ""
    val rest = canonicalUrl.substring(i + 3)
    var end = rest.length
    var j = 0
    var done = false
    while (j < rest.length && !done) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') { end = j; done = true }
      j += 1
    }
    val auth = rest.substring(0, end)
    val at = auth.lastIndexOf('@')
    val hp = if (at >= 0) auth.substring(at + 1) else auth
    val colon = hp.lastIndexOf(':')
    // don't strip from IPv6 literals like [::1]
    if (colon >= 0 && hp.indexOf(']') < colon) hp.substring(0, colon)
    else if (colon >= 0 && !hp.contains('[')) hp.substring(0, colon)
    else hp
  }

  /** Canonical 64-bit URL identity (north rule: xxhash64 of canonical URL). */
  def urlHash(raw: String): Long = XxHash64.hashUtf8(canonicalize(raw))

  /** RFC-3986-style reference resolution, approximating the browser's
    * `a.href` property semantics that the reference relies on
    * (`page.$$eval("a", as => as.map(a => a.href))` returns *absolute*
    * URLs, `scrape-pdfs-from-website/lambda.ts:58-61`).
    */
  /** Absolute iff a VALID scheme (alpha, then alnum/+/./-) precedes "://"
    * — `indexOf("://") > 0` alone misclassified root-relative hrefs with an
    * embedded URL (`/login?next=https://a.com`) as absolute, which then
    * canonicalized into a garbage scheme/host and an unfetchable frontier
    * entry (round-5 review). */
  private def hasScheme(s: String): Boolean = {
    val i = s.indexOf("://")
    if (i <= 0) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var j = 1
    while (j < i) {
      val c = s.charAt(j)
      if (!(Character.isLetterOrDigit(c) || c == '+' || c == '.' || c == '-')) return false
      j += 1
    }
    true
  }

  def resolve(baseUrl: String, href0: String): String = {
    val href = JsText.jsTrim(href0)
    if (href.isEmpty) return baseUrl
    if (hasScheme(href)) return href // already absolute
    val schemeEnd = baseUrl.indexOf("://")
    if (schemeEnd <= 0) return href
    val scheme = baseUrl.substring(0, schemeEnd)
    if (href.startsWith("//")) return scheme + ":" + href
    val rest = baseUrl.substring(schemeEnd + 3)
    val slash = rest.indexOf('/')
    val origin = if (slash < 0) baseUrl else baseUrl.substring(0, schemeEnd + 3 + slash)
    val basePathQ = if (slash < 0) "/" else rest.substring(slash)
    if (href.startsWith("/")) return origin + href
    if (href.startsWith("#")) {
      val h = basePathQ.indexOf('#')
      val noFrag = if (h >= 0) basePathQ.substring(0, h) else basePathQ
      return origin + noFrag + href
    }
    def pathEnd(s: String): Int = {
      val q = s.indexOf('?'); val h = s.indexOf('#')
      if (q < 0 && h < 0) s.length else if (q < 0) h else if (h < 0) q else math.min(q, h)
    }
    if (href.startsWith("?")) {
      // strip the base's query AND fragment: `?x` on base `/p#f` resolves
      // to `/p?x` in a browser, not `/p#f?x` (round-5 review)
      return origin + basePathQ.substring(0, pathEnd(basePathQ)) + href
    }
    // relative path: resolve against base directory, collapsing ./ and ../
    // over the PATH part only — the href's own query/fragment must ride
    // along untouched (dot-segments inside `?p=/a/../b` are query DATA;
    // collapsing them fetched a different resource — round-5 review)
    val basePath = basePathQ.substring(0, pathEnd(basePathQ))
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    val hrefPath = href.substring(0, pathEnd(href))
    val hrefSuffix = href.substring(pathEnd(href))
    val merged = dir + hrefPath
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    for (seg <- merged.split("/", -1)) seg match {
      case "" | "." => ()
      case ".."     => if (segs.nonEmpty) segs.remove(segs.length - 1)
      case s        => segs += s
    }
    val tail = merged.substring(merged.lastIndexOf('/') + 1)
    val dirLike = merged.endsWith("/") || tail == "." || tail == ".."
    val path = "/" + segs.mkString("/") + (if (dirLike && segs.nonEmpty) "/" else "")
    origin + path + hrefSuffix
  }
}
