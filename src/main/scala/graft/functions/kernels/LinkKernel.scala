package graft.functions.kernels

import java.nio.charset.StandardCharsets

import graft.util.UrlCanonicalizer

/** Anchor-href extraction over raw HTML bytes, preserving DOM document
  * order — the semantics of the reference's
  * `page.$$eval("a", as => as.map(a => a.href))`
  * (`scrape-pdfs-from-website/lambda.ts:58-61`). The browser's `a.href`
  * property yields *absolute* URLs, so hrefs are resolved against the
  * page URL ([[UrlCanonicalizer.resolve]]).
  *
  * Static JVM kernel so the Catalyst expression wrapping it
  * ([[graft.functions.ExtractLinks]]) can call it from generated code and
  * stay inside whole-stage codegen.
  */
object LinkKernel {

  /** All `<a ... href=...>` values in document order, resolved to absolute
    * form. Charset is locked to UTF-8 (SURVEY.md 7.3(c)).
    */
  def extractLinks(html: Array[Byte], baseUrl: String): Array[String] = {
    if (html == null) return Array.empty
    extractLinksStr(new String(html, StandardCharsets.UTF_8), baseUrl)
  }

  /** Same, over an already-decoded body (one-decode fused path). */
  def extractLinksStr(html: String, baseUrl: String): Array[String] =
    extractHrefs(html).map(h => UrlCanonicalizer.resolve(baseUrl, h))

  /** Raw href attribute values of anchor tags, document order, unresolved.
    * A linear scanner (not a full HTML parser): finds `<a` tag openings,
    * then scans attributes for `href`, honoring single/double/no quotes.
    * Anchors without an href contribute nothing (matches `a.href` being
    * "" only for `href=""`; puppeteer maps missing href to "" too — the
    * browser resolves "" to the page URL, which resolve() reproduces).
    */
  def extractHrefs(html: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = html.length
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) { i = n }
      else {
        val c1 = html.charAt(lt + 1)
        if ((c1 == 'a' || c1 == 'A') &&
            (lt + 2 >= n || isTagNameEnd(html.charAt(lt + 2)))) {
          // quote-aware tag-end scan (HTML5 attribute-value-quoted state):
          // a '>' inside a quoted attribute value is part of the value, so
          // <a href="/p?q=a>b"> must not truncate at the inner '>' — the
          // browser/a.href reference keeps the full value (round-5 review)
          val tagEnd = {
            var j = lt
            var quote: Char = 0
            var afterEq = false // quotes only OPEN in attribute-value position
            var end = -1
            while (end < 0 && j < n) {
              val c = html.charAt(j)
              if (quote != 0) { if (c == quote) quote = 0 }
              else if (afterEq && (c == '"' || c == '\'')) { quote = c; afterEq = false }
              else if (c == '=') afterEq = true
              else if (c == '>') end = j
              else if (!Character.isWhitespace(c)) afterEq = false
              j += 1
            }
            if (end < 0) n else end
          }
          val tag = html.substring(lt, tagEnd)
          findHref(tag).foreach(out += _)
          i = tagEnd + 1
        } else if (c1 == '!' && html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) n else end + 3
        } else if (html.regionMatches(true, lt + 1, "script", 0, 6)) {
          val end = indexOfIgnoreCase(html, "</script", lt)
          i = if (end < 0) n else end + 1
        } else {
          i = lt + 1
        }
      }
    }
    out.toArray
  }

  @inline private def isTagNameEnd(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '>' || c == '/'

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = from
    val n = s.length - needle.length
    while (i <= n) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** href attribute value within one tag string. */
  private def findHref(tag: String): Option[String] = {
    var i = 2 // skip "<a"
    val n = tag.length
    while (i < n) {
      val idx = indexOfIgnoreCase(tag, "href", i)
      if (idx < 0) return None
      // must be a standalone attribute name
      val before = tag.charAt(idx - 1)
      var j = idx + 4
      while (j < n && Character.isWhitespace(tag.charAt(j))) j += 1
      if ((before == ' ' || before == '\t' || before == '\n' || before == '\r') &&
          j < n && tag.charAt(j) == '=') {
        j += 1
        while (j < n && Character.isWhitespace(tag.charAt(j))) j += 1
        if (j >= n) return Some("")
        val q = tag.charAt(j)
        if (q == '"' || q == '\'') {
          val close = tag.indexOf(q, j + 1)
          return Some(if (close < 0) tag.substring(j + 1) else tag.substring(j + 1, close))
        } else {
          var k = j
          while (k < n && !Character.isWhitespace(tag.charAt(k)) && tag.charAt(k) != '>') k += 1
          return Some(tag.substring(j, k))
        }
      }
      i = idx + 4
    }
    None
  }
}
