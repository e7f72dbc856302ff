package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col

/** Sitemap parser — the crawl's second discovery channel next to link
  * extraction (reference scope note: the reference discovers only by
  * scraping anchor tags, `scrape-pdfs-from-website/lambda.ts:52-63`; a
  * Common-Crawl-style frontier also ingests the sitemaps hosts publish,
  * which is where most of a large site's URL inventory actually lives).
  *
  * Formats per the public sitemaps.org protocol:
  *  - URL set: `<urlset>` of `<url>` blocks, each with a required `<loc>`
  *    and optional `<lastmod>` (W3C datetime), `<changefreq>`, `<priority>`
  *    (0.0–1.0, default 0.5);
  *  - sitemap index: `<sitemapindex>` of `<sitemap><loc>` blocks pointing
  *    at child sitemaps — returned separately so the crawl loop can fetch
  *    and expand them (one level per tick, like any other fetch);
  *  - plain text: one URL per line (no markup at all).
  *
  * The scanner is deliberately lenient, like production crawlers: no XML
  * library, case-insensitive tags, CDATA and the five XML entities handled,
  * malformed blocks skipped, never throws. Parsing is a per-row pure
  * function — [[parseAll]] runs it scan-side with no shuffle.
  */
object SitemapParser {

  /** One sitemap line item. `priority` is the protocol default 0.5 when
    * absent; `lastmod` stays the raw W3C-datetime string (the engine's
    * scheduler compares it lexicographically, which W3C datetime supports). */
  final case class SitemapUrl(
      loc: String,
      lastmod: Option[String],
      changefreq: Option[String],
      priority: Double)

  final case class Parsed(urls: Seq[SitemapUrl], childSitemaps: Seq[String])

  def parse(body: String): Parsed = {
    val b = if (body == null) "" else body
    if (!b.contains('<')) {
      // plain-text sitemap: one URL per line
      val urls = b.linesIterator.map(_.trim)
        .filter(l => l.startsWith("http://") || l.startsWith("https://"))
        .map(SitemapUrl(_, None, None, DefaultPriority)).toSeq
      Parsed(urls, Nil)
    } else {
      val lower = b.toLowerCase
      val urls = blocks(b, lower, "url").flatMap(parseUrlBlock(_, b, lower))
      val children = blocks(b, lower, "sitemap")
        .flatMap { case (s, e) => tagText(b, lower, s, e, "loc") }
      Parsed(urls, children)
    }
  }

  val DefaultPriority = 0.5

  private def parseUrlBlock(span: (Int, Int), b: String, lower: String): Option[SitemapUrl] =
    tagText(b, lower, span._1, span._2, "loc").map { loc =>
      SitemapUrl(
        loc,
        tagText(b, lower, span._1, span._2, "lastmod"),
        tagText(b, lower, span._1, span._2, "changefreq"),
        tagText(b, lower, span._1, span._2, "priority")
          .flatMap(_.toDoubleOption).getOrElse(DefaultPriority))
    }

  private def blocks(b: String, lower: String, tag: String): Seq[(Int, Int)] = {
    val open = "<" + tag
    val close = "</" + tag
    val out = ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i >= 0 && i < lower.length) {
      val s = lower.indexOf(open, i)
      // require the open tag to be exactly `tag` (not a prefix like <urlset>)
      if (s < 0) i = -1
      else {
        val after = s + open.length
        val isExact = after < lower.length && (lower.charAt(after) == '>' || lower.charAt(after).isWhitespace)
        if (!isExact) i = after
        else {
          val e = lower.indexOf(close, after)
          if (e < 0) i = -1
          else { out += ((after, e)); i = e + close.length }
        }
      }
    }
    out.toSeq
  }

  /** Text of the first `<tag>...</tag>` inside [from, to), entity-decoded,
    * CDATA unwrapped, trimmed; None when absent or empty. */
  private def tagText(b: String, lower: String, from: Int, to: Int, tag: String): Option[String] = {
    val open = "<" + tag
    var s = lower.indexOf(open, from)
    while (s >= 0 && s < to) {
      val gt = lower.indexOf('>', s)
      val isExact = {
        val after = s + open.length
        after < lower.length && (lower.charAt(after) == '>' || lower.charAt(after).isWhitespace)
      }
      if (gt < 0 || gt >= to) return None
      else if (isExact) {
        val e = lower.indexOf("</" + tag, gt + 1)
        if (e < 0 || e > to) return None
        val raw = b.substring(gt + 1, e).trim
        val txt = decode(raw).trim
        return if (txt.isEmpty) None else Some(txt)
      } else s = lower.indexOf(open, s + open.length)
    }
    None
  }

  private def decode(s: String): String = {
    val cdata = s.trim
    val unwrapped =
      if (cdata.startsWith("<![CDATA[") && cdata.endsWith("]]>"))
        cdata.substring(9, cdata.length - 3)
      else cdata
    if (!unwrapped.contains('&')) unwrapped
    else unwrapped
      // &amp; LAST: decoding it first re-decodes doubly-escaped entities
      // (&amp;lt; must yield the literal '&lt;', not '<' — round-5 review)
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")
  }

  /** Spark stage over a fetched-sitemaps corpus `(url string, body string)`:
    * one row per sitemap line item, carrying the source sitemap url. Child
    * sitemaps of an index surface as rows with `is_index = true` whose
    * `loc` is the child sitemap to fetch next tick. */
  def parseAll(sitemapBodies: DataFrame): DataFrame = {
    val spark = sitemapBodies.sparkSession
    import spark.implicits._
    implicit val tup = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    sitemapBodies.select(col("url").cast("string"), col("body").cast("string"))
      .as[(String, String)]
      .flatMap { case (src, body) =>
        val p = parse(body)
        p.urls.iterator.map(u =>
          (src, u.loc, u.lastmod.orNull, u.changefreq.orNull, u.priority, false)) ++
          p.childSitemaps.iterator.map(c => (src, c, null: String, null: String, DefaultPriority, true))
      }
      .toDF("sitemap_url", "loc", "lastmod", "changefreq", "priority", "is_index")
  }

  /** Cheap content sniff over the first 2 KB: is this fetched body a
    * sitemap? (url-extension hints are unreliable in the wild; the markup
    * is not). Used by the crawl loop's `extract_links_auto` to route a
    * page through sitemap parsing instead of anchor extraction. */
  def looksLikeSitemap(html: Array[Byte]): Boolean = {
    if (html == null || html.length == 0) false
    else looksLikeSitemapStr(new String(
      html, 0, math.min(html.length, 2048), java.nio.charset.StandardCharsets.UTF_8))
  }

  def looksLikeSitemapStr(body: String): Boolean = {
    val head =
      (if (body.length > 2048) body.substring(0, 2048) else body).toLowerCase
    head.contains("<urlset") || head.contains("<sitemapindex")
  }

  /** The links a sitemap page contributes to discovery, in document order:
    * line-item locs first, then child sitemaps (an index's children are
    * themselves crawled, and — being sitemaps — re-expand next tick). */
  def sitemapLinks(html: Array[Byte]): Array[String] =
    sitemapLinksStr(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def sitemapLinksStr(body: String): Array[String] = {
    val p = parse(body)
    (p.urls.view.map(_.loc) ++ p.childSitemaps).toArray
  }

  /** Sitemap line items → crawl seeds (depth 0; the sitemap's lastmod
    * becomes the discovery timestamp when parseable, else `fallbackTs`). */
  def toSeeds(entries: Seq[SitemapUrl], fallbackTs: java.sql.Timestamp): Seq[graft.model.Seed] =
    entries.map { u =>
      val ts = u.lastmod.flatMap { lm =>
        try Some(java.sql.Timestamp.from(java.time.OffsetDateTime.parse(lm).toInstant))
        catch {
          case _: Exception =>
            try Some(java.sql.Timestamp.valueOf(java.time.LocalDate.parse(lm).atStartOfDay()))
            catch { case _: Exception => None }
        }
      }.getOrElse(fallbackTs)
      graft.model.Seed(u.loc, 0, ts)
    }
}
