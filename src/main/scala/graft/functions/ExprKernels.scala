package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.kernels.{BlockGraphKernel, LinkKernel}
import graft.util.UrlCanonicalizer

/** Static bridge between Spark's internal types and the pure kernels —
  * the single call target for both `nullSafeEval` and generated code, so
  * every custom expression stays inside whole-stage codegen (the generated
  * Java calls these directly; see each expression's `doGenCode`).
  */
object ExprKernels {

  def links(html: Array[Byte], base: UTF8String): ArrayData = {
    val out = LinkKernel.extractLinks(html, if (base == null) "" else base.toString)
    new GenericArrayData(out.map(s => UTF8String.fromString(s): AnyRef))
  }

  /** Anchor extraction OR sitemap expansion, routed by a 2 KB content
    * sniff: a fetched body that is a sitemap (urlset / sitemapindex)
    * contributes its loc entries — absolute by protocol, so no base
    * resolution — in document order; anything else goes through the HTML
    * link kernel. One decode pass either way. */
  def linksAuto(html: Array[Byte], base: UTF8String): ArrayData =
    if (graft.operators.SitemapParser.looksLikeSitemap(html))
      new GenericArrayData(
        graft.operators.SitemapParser.sitemapLinks(html)
          .map(s => UTF8String.fromString(s): AnyRef))
    else links(html, base)

  /** (text, data) struct per BlockGraphKernel; map entries keep the
    * reference's insertion order. */
  def extractDocument(html: Array[Byte], blockCap: Int): InternalRow =
    docRow(BlockGraphKernel.extract(html, blockCap))

  private def docRow(r: BlockGraphKernel.ExtractResult): InternalRow = {
    val keys = new Array[AnyRef](r.data.length)
    val vals = new Array[AnyRef](r.data.length)
    var i = 0
    r.data.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      vals(i) = UTF8String.fromString(v)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r.text),
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))))
  }

  /** Fused per-page extraction: ONE decode of the fat html column feeds
    * both the document kernel and link discovery (anchor hrefs, or sitemap
    * locs when `sitemapAuto` and the body sniffs as a sitemap). Returns
    * struct(doc struct<text,data>, links array<string>) — bit-identical to
    * running [[extractDocument]] and [[links]]/[[linksAuto]] separately
    * (parity-tested), at half the decode cost of the unfused pair. */
  def extractPage(html: Array[Byte], base: UTF8String, blockCap: Int, sitemapAuto: Boolean): InternalRow = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val doc = docRow(BlockGraphKernel.extractStr(s, blockCap))
    val linkArr: Array[String] =
      // byte-window sniff, NOT the decoded string: linksAuto sniffs the
      // first 2048 BYTES, and the parity contract ("bit-identical to the
      // unfused pair") requires the same window here — a string-window
      // sniff saw ~3x further into multi-byte pages and could route the
      // two documented-equivalent paths differently (round-5 review)
      if (sitemapAuto && graft.operators.SitemapParser.looksLikeSitemap(html))
        graft.operators.SitemapParser.sitemapLinksStr(s)
      else LinkKernel.extractLinksStr(s, if (base == null) "" else base.toString)
    new GenericInternalRow(Array[Any](
      doc, new GenericArrayData(linkArr.map(x => UTF8String.fromString(x): AnyRef))))
  }

  /** Fused link identity: canonicalize ONCE, derive hash + host from the
    * canonical form (urlHash(raw) ≡ xxh64(canonicalize(raw)), and host is
    * defined over the canonical url — so this is exactly the unfused
    * triple at a third of the canonicalization cost). */
  def linkIdentity(url: UTF8String): InternalRow = {
    val cu = UrlCanonicalizer.canonicalize(url.toString)
    new GenericInternalRow(Array[Any](
      graft.util.XxHash64.hashUtf8(cu),
      UTF8String.fromString(cu),
      UTF8String.fromString(UrlCanonicalizer.host(cu))))
  }

  def canonicalize(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanonicalizer.canonicalize(url.toString))

  def canonHash(url: UTF8String): Long =
    UrlCanonicalizer.urlHash(url.toString)

  def host(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanonicalizer.host(url.toString))

  def resolveUrl(base: UTF8String, href: UTF8String): UTF8String =
    UTF8String.fromString(UrlCanonicalizer.resolve(base.toString, href.toString))
}
