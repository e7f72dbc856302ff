package graft.synth

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.kernels.{BlockGraphKernel, LinkKernel}
import graft.util.UrlCanonicalizer

class PageSynthSpec extends AnyFunSuite {

  private val N = 200L
  private lazy val corpus = PageSynth.pages(N)

  test("generation is deterministic and order-independent") {
    val again = PageSynth.synthPage(123L, N)
    val first = corpus(123)
    assert(first.page.url == again.page.url)
    assert(first.page.html.sameElements(again.page.html))
    assert(first.page.text == again.page.text)
    assert(first.links == again.links)
  }

  test("closed link graph: every link resolves to a corpus url") {
    val urls = corpus.map(p => UrlCanonicalizer.canonicalize(p.page.url)).toSet
    corpus.foreach { p =>
      p.links.foreach(l => assert(urls.contains(UrlCanonicalizer.canonicalize(l)), s"dangling $l"))
    }
  }

  test("megahost skew present") {
    val hosts = corpus.groupBy(p => UrlCanonicalizer.host(p.page.url)).view.mapValues(_.size)
    val mega = hosts.getOrElse("host0.example.com", 0)
    assert(mega > N * 0.25, s"megahost only $mega of $N")
  }

  test("kernel extracts golden text byte-identically (generator-independent check)") {
    corpus.foreach { sp =>
      val r = BlockGraphKernel.extract(sp.page.html)
      assert(r.text == sp.page.text, s"text mismatch for ${sp.page.url}")
      assert(r.data == sp.kv, s"kv mismatch for ${sp.page.url}")
    }
  }

  test("kernel extracts links in document order matching generator ground truth") {
    corpus.foreach { sp =>
      val got = LinkKernel.extractLinks(sp.page.html, sp.page.url).toVector
      assert(got == sp.links, s"links mismatch for ${sp.page.url}")
    }
  }

  test("some urls pass the DownloadDocumentPDF filter, some do not") {
    val (docs, hubs) = corpus.partition(_.page.url.contains("DownloadDocumentPDF"))
    assert(docs.nonEmpty && hubs.nonEmpty)
    docs.foreach(d => assert(d.page.url.contains("DocumentId=")))
  }

  test("seeds are distinct-host urls from the corpus") {
    val s = PageSynth.seeds(N, 5)
    assert(s.size == 5)
    assert(s.map(x => UrlCanonicalizer.host(x.url)).distinct.size == 5)
  }
}
