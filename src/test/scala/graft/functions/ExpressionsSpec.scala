package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions._
import graft.functions.kernels.{BlockGraphKernel, LinkKernel}
import graft.synth.PageSynth
import graft.util.UrlCanonicalizer

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = PageSynth.pages(60L)
  private lazy val pagesDf = spark.createDataFrame(corpus.map(_.page)).cache()

  test("extract_links matches kernel on every page, through the DataFrame engine") {
    val got = pagesDf
      .select($"url", extract_links($"html", $"url").as("links"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector)
      .toMap
    corpus.foreach { sp =>
      assert(got(sp.page.url) == sp.links, s"links mismatch ${sp.page.url}")
    }
  }

  test("extract_page == (extract_document, extract_links) on every page; sitemap auto routes") {
    val fused = pagesDf
      .select($"url", extract_page($"html", $"url").as("p"))
      .select($"url", $"p.doc.text".as("t"), $"p.links".as("links"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getSeq[String](2).toVector)).toMap
    val unfused = pagesDf
      .select($"url", extract_document($"html").as("d"), extract_links($"html", $"url").as("links"))
      .select($"url", $"d.text".as("t"), $"links")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getSeq[String](2).toVector)).toMap
    assert(fused == unfused)

    // sitemapAuto: a sitemap body yields its locs; a normal page is unchanged
    val sm = "<urlset><url><loc>https://e.com/a</loc></url><url><loc>https://e.com/b</loc></url></urlset>"
    val mixed = Seq(
      ("https://e.com/sitemap.xml", sm.getBytes("UTF-8")),
      (corpus.head.page.url, corpus.head.page.html)).toDF("url", "html")
    val auto = mixed
      .select($"url", extract_page($"html", $"url", sitemapAuto = true).as("p"))
      .select($"url", $"p.links".as("links"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(auto("https://e.com/sitemap.xml") == Vector("https://e.com/a", "https://e.com/b"))
    assert(auto(corpus.head.page.url) == corpus.head.links)
  }

  test("extract_document yields byte-identical text + ordered map") {
    val got = pagesDf
      .select($"url", extract_document($"html").as("doc"))
      .select($"url", $"doc.text", $"doc.data")
      .collect()
    val byUrl = got.map(r => (r.getString(0), (r.getString(1), r.getMap[String, String](2)))).toMap
    corpus.foreach { sp =>
      val (text, data) = byUrl(sp.page.url)
      assert(text == sp.page.text, s"text mismatch ${sp.page.url}")
      assert(data.toSeq.sorted == sp.kv.sorted, s"kv mismatch ${sp.page.url}")
    }
  }

  test("url_hash64 / canonicalize_url / url_host agree with the Scala kernels") {
    val rows = pagesDf
      .select($"url", url_hash64($"url"), canonicalize_url($"url"), url_host($"url"))
      .collect()
    rows.foreach { case Row(u: String, h: Long, c: String, ho: String) =>
      assert(h == UrlCanonicalizer.urlHash(u))
      assert(c == UrlCanonicalizer.canonicalize(u))
      assert(ho == UrlCanonicalizer.host(c))
    }
  }

  test("SQL registration: functions usable from spark.sql") {
    GraftFunctions.registerAll(spark)
    pagesDf.createOrReplaceTempView("pages_expr_test")
    val n = spark
      .sql("""SELECT url_hash64(url) h, size(extract_links(html, url)) n,
              |extract_document(html).text t FROM pages_expr_test""".stripMargin)
      .where($"n" > 0 && length($"t") > 0)
      .count()
    assert(n == 60)
  }

  test("explode(extract_links) composes with filter pushdown-friendly plan") {
    val links = pagesDf
      .select($"url".as("src"), posexplode(extract_links($"html", $"url")).as(Seq("pos", "link")))
      .where($"link".contains("DownloadDocumentPDF"))
    assert(links.count() > 0)
    // document-order position is preserved by posexplode
    val one = links.where($"src" === corpus.head.page.url).orderBy($"pos").collect()
    val expected = corpus.head.links.zipWithIndex
      .filter(_._1.contains("DownloadDocumentPDF"))
    assert(one.map(r => (r.getString(2), r.getInt(1))).toVector ==
      expected.map { case (l, i) => (l, i) })
  }

  test("expressions run inside whole-stage codegen (no fallback in plan)") {
    val plan = pagesDf
      .select(url_hash64($"url"), extract_document($"html"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators compiled by WholeStageCodegen; a
    // CodegenFallback expression would strip it from the Project
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }

  test("null inputs yield null outputs, not exceptions") {
    val df = Seq((null.asInstanceOf[Array[Byte]], "https://x.com/")).toDF("html", "url")
    val r = df.select(
      extract_links($"html", $"url"),
      extract_document($"html"),
      url_hash64(lit(null).cast("string"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("block cap is honored through the column API") {
    val sp = corpus.head
    val capped = pagesDf
      .where($"url" === sp.page.url)
      .select(extract_document($"html", blockCap = 1).as("d"))
      .select($"d.text").as[String].head()
    assert(capped == "") // first block is a WORD, no LINE within cap 1
  }

  test("link_identity == the unfused hash/canonical/host triple, field for field") {
    // round-5 review: the fused expression replaces THREE canonicalizations
    // per discovered link in the tick loop's hottest path — it must be
    // bit-identical to the composition on every shape of input
    val urls = Seq(
      "HTTP://Example.COM:80/a/../b?q=1#frag",
      "https://h.com/dir/page.html",
      "https://h.com",
      "relative/path.html",
      "  https://pad.me/x  ",
      "ftp://odd.scheme/z",
      "https://host.com/p?q=a>b",
      "")
    val got = urls.toDF("u")
      .select(
        link_identity($"u").as("li"),
        url_hash64($"u").as("h"),
        canonicalize_url($"u").as("cu"),
        url_host(canonicalize_url($"u")).as("host"))
      .collect()
    got.foreach { r =>
      val li = r.getStruct(0)
      assert(li.getLong(0) == r.getLong(1), s"hash mismatch for ${r}")
      assert(li.getString(1) == r.getString(2), s"url mismatch for ${r}")
      assert(li.getString(2) == r.getString(3), s"host mismatch for ${r}")
    }
    // and over the real corpus' extracted links, end to end
    val links = pagesDf.select(explode(extract_links($"html", $"url")).as("u"))
    val n = links
      .select(link_identity($"u").as("li"), url_hash64($"u").as("h"))
      .where($"li.url_hash" =!= $"h").count()
    assert(n == 0L)
  }
}
