package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SitemapParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://example.com/a?x=1&amp;y=2</loc>
      |    <lastmod>2024-06-01</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc><![CDATA[https://example.com/b]]></loc></url>
      |</urlset>""".stripMargin

  test("urlset: loc entity-decoded, optional fields, protocol default priority") {
    val p = SitemapParser.parse(urlset)
    assert(p.childSitemaps.isEmpty)
    assert(p.urls.map(_.loc) == Seq("https://example.com/a?x=1&y=2", "https://example.com/b"))
    assert(p.urls.head.lastmod.contains("2024-06-01"))
    assert(p.urls.head.changefreq.contains("daily"))
    assert(p.urls.head.priority == 0.8)
    assert(p.urls(1).priority == SitemapParser.DefaultPriority)
  }

  test("sitemap index: children returned for expansion, not as URLs") {
    val idx =
      """<sitemapindex>
        |  <sitemap><loc>https://example.com/sitemap1.xml</loc><lastmod>2024-01-01</lastmod></sitemap>
        |  <sitemap><loc>https://example.com/sitemap2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val p = SitemapParser.parse(idx)
    assert(p.urls.isEmpty)
    assert(p.childSitemaps ==
      Seq("https://example.com/sitemap1.xml", "https://example.com/sitemap2.xml"))
  }

  test("plain-text sitemap: one URL per line, junk lines skipped") {
    val p = SitemapParser.parse(
      "https://example.com/x\n# comment\nnot a url\nhttps://example.com/y\n")
    assert(p.urls.map(_.loc) == Seq("https://example.com/x", "https://example.com/y"))
  }

  test("case-insensitive tags; <url> not confused with <urlset>; malformed never throws") {
    val p = SitemapParser.parse("<URLSET><URL><LOC>https://e.com/Z</LOC></URL></URLSET>")
    assert(p.urls.map(_.loc) == Seq("https://e.com/Z"))
    assert(SitemapParser.parse(null).urls.isEmpty)
    assert(SitemapParser.parse("<urlset><url><loc>").urls.isEmpty)
    assert(SitemapParser.parse("<url>no loc here</url>").urls.isEmpty)
  }

  test("parseAll: scan-side flatMap over (url, body); index rows flagged") {
    import spark.implicits._
    val df = Seq(
      ("https://example.com/sitemap.xml", urlset),
      ("https://example.com/index.xml",
        "<sitemapindex><sitemap><loc>https://example.com/child.xml</loc></sitemap></sitemapindex>"))
      .toDF("url", "body")
    val rows = SitemapParser.parseAll(df)
      .select("sitemap_url", "loc", "is_index")
      .as[(String, String, Boolean)].collect().toSet
    assert(rows == Set(
      ("https://example.com/sitemap.xml", "https://example.com/a?x=1&y=2", false),
      ("https://example.com/sitemap.xml", "https://example.com/b", false),
      ("https://example.com/index.xml", "https://example.com/child.xml", true)))
  }

  test("crawl integration: sitemapDiscovery expands index -> urlset -> pages in order") {
    import java.nio.charset.StandardCharsets.UTF_8
    import graft.crawl.{CrawlConfig, CrawlDriver}
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    def page(url: String, body: String) =
      graft.model.Page(url, ts, body.getBytes(UTF_8), "", "en")
    val idx = "https://host0.example.com/sitemap.xml"
    val child = "https://host0.example.com/sitemap1.xml"
    val p1 = "https://host0.example.com/p1"
    val p2 = "https://host0.example.com/p2"
    val pages = Seq(
      page(idx, s"<sitemapindex><sitemap><loc>$child</loc></sitemap></sitemapindex>"),
      page(child, s"<urlset><url><loc>$p1</loc></url><url><loc>$p2</loc></url></urlset>"),
      page(p1, "<html><body>alpha</body></html>"),
      page(p2, "<html><body>bravo</body></html>"))
    val lake = graft.lake.CrawlLake.forCrawl(
      java.nio.file.Files.createTempDirectory("graft-lake-sm").toString, spark, buckets = 4)
    val robots = spark.createDataset(Seq.empty[graft.model.RobotsEntry])
    val driver = new CrawlDriver(
      spark, lake, spark.createDataFrame(pages), robots,
      CrawlConfig(budget = 10, seenPartitions = 4, expectedPerSegment = 1024,
        sitemapDiscovery = true))
    driver.init(Seq(graft.model.Seed(idx, 0, ts)))
    driver.run(4)
    val byBatch = driver.fetchLog.select("batch_id", "url")
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(1L) == Set(idx))
    assert(byBatch(2L) == Set(child))
    assert(byBatch(3L) == Set(p1, p2))
    // sitemap order is the discovery order (seq_in_page 0, 1)
    val order = driver.frontier.where(org.apache.spark.sql.functions.col("url").isin(p1, p2))
      .select("url", "seq_in_page").as[(String, Long)].collect().toMap
    assert(order(p1) == 0L && order(p2) == 1L)
  }

  test("toSeeds: lastmod date and datetime forms parsed, fallback otherwise") {
    val fallback = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val seeds = SitemapParser.toSeeds(
      Seq(
        SitemapParser.SitemapUrl("https://e.com/1", Some("2024-06-01"), None, 0.5),
        SitemapParser.SitemapUrl("https://e.com/2", Some("2024-06-01T10:00:00+02:00"), None, 0.5),
        SitemapParser.SitemapUrl("https://e.com/3", Some("junk"), None, 0.5),
        SitemapParser.SitemapUrl("https://e.com/4", None, None, 0.5)),
      fallback)
    assert(seeds.map(_.url) == Seq("https://e.com/1", "https://e.com/2", "https://e.com/3", "https://e.com/4"))
    assert(seeds.head.discovery_ts == java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
    assert(seeds(1).discovery_ts == java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T08:00:00Z")))
    assert(seeds(2).discovery_ts == fallback)
    assert(seeds(3).discovery_ts == fallback)
    assert(seeds.forall(_.depth == 0))
  }
}
