package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.WarcIO.WarcRecord

/** [[WarcIO]] — ISO 28500 framing, gzip members, HTTP envelopes, and the
  * Spark ingest/export stages. */
class WarcIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(uri: String, body: String, typ: String = "response"): WarcRecord = {
    val b = body.getBytes("UTF-8")
    val http = (s"HTTP/1.1 200 OK\r\nContent-Length: ${b.length}\r\n\r\n").getBytes("US-ASCII") ++ b
    WarcRecord(typ, uri, "2026-08-17T00:00:00Z", if (typ == "response") http else b)
  }

  test("round-trip: multi-record archive parses back exactly") {
    val records = Seq(
      rec("http://a.example/1", "hello world"),
      rec("http://a.example/2", "second récord with ünïcödé"),
      WarcRecord("warcinfo", "", "2026-08-17T00:00:00Z", "software: graft\r\n".getBytes("US-ASCII")),
      rec("http://a.example/3", ""))
    val parsed = WarcIO.parseAll(WarcIO.write(records)).get
    assert(parsed.length == 4)
    parsed.zip(records).foreach { case (p, w) =>
      assert(p.warcType == w.warcType && p.targetUri == w.targetUri && p.date == w.date)
      assert(p.payload.sameElements(w.payload))
    }
  }

  test("framing is Content-Length only: a payload containing WARC lines must not split") {
    val trap = "an article about warc:\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\ngotcha"
    val records = Seq(rec("http://t.example/x", trap), rec("http://t.example/y", "after"))
    val parsed = WarcIO.parseAll(WarcIO.write(records)).get
    assert(parsed.length == 2)
    assert(new String(WarcIO.httpResponse(parsed.head.payload).get._2, "UTF-8") == trap)
    assert(parsed(1).targetUri == "http://t.example/y")
  }

  test("gzip: member-per-record and whole-stream both parse; auto-detect routes") {
    val records = Seq(rec("http://g.example/1", "one"), rec("http://g.example/2", "two"))
    val perMember = WarcIO.writeGzip(records)
    val whole = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(WarcIO.write(records)); gz.finish()
      out.toByteArray
    }
    for (blob <- Seq(perMember, whole)) {
      val parsed = WarcIO.parseAuto(blob).get
      assert(parsed.map(_.targetUri) == records.map(_.targetUri))
    }
    // plain bytes also route through auto
    assert(WarcIO.parseAuto(WarcIO.write(records)).get.length == 2)
  }

  test("http envelope: status parses; non-http payloads refuse") {
    val b = "body".getBytes("UTF-8")
    val p404 = "HTTP/1.1 404 Not Found\r\nX: y\r\n\r\n".getBytes("US-ASCII") ++ b
    assert(WarcIO.httpResponse(p404).map { case (c, bb) => (c, new String(bb, "UTF-8")) }
      .contains((404, "body")))
    assert(WarcIO.httpResponse("not http at all".getBytes("US-ASCII")).isEmpty)
    assert(WarcIO.httpResponse("no blank line".getBytes("US-ASCII")).isEmpty)
  }

  test("totality: truncation at every prefix is None or an exact prefix-free parse") {
    val blob = WarcIO.write(Seq(rec("http://u.example/1", "aaaa"), rec("http://u.example/2", "bb")))
    for (len <- 0 until blob.length) {
      val r = WarcIO.parseAll(java.util.Arrays.copyOfRange(blob, 0, len))
      // must never throw; a successful parse may only happen at record
      // boundaries and must then be an exact prefix of the full parse
      r.foreach(rs => assert(rs.length <= 2))
    }
    // bad Content-Length → None
    val tampered = new String(blob, "ISO-8859-1").replaceFirst("Content-Length: ", "Content-Length: x")
    assert(WarcIO.parseAll(tampered.getBytes("ISO-8859-1")).isEmpty)
  }

  test("spark stages: exportArchives → explodeRecords reproduces the rows; corrupt is loud") {
    val rows = (0 until 37).map(i =>
      (s"http://s.example/d/$i", "2026-08-17T00:00:00Z", s"content number $i with bytes".getBytes("UTF-8")))
    val df = rows.toDF("url", "warc_date", "body").repartition(4)
    val archives = WarcIO.exportArchives(df)
    val nArch = archives.count()
    assert(nArch >= 1 && nArch <= 4)
    val back = WarcIO.explodeRecords(archives.drop("n_records"), blobCol = "warc")
    val got = back.select("uri", "http_status", "body").collect()
      .map(r => (r.getString(0), r.getInt(1), new String(r.getAs[Array[Byte]](2), "UTF-8"))).toSet
    assert(got == rows.map(r => (r._1, 200, new String(r._3, "UTF-8"))).toSet)
    // a corrupt archive yields the marker row, not silence
    val corrupt = Seq(Tuple1("this is not warc".getBytes("UTF-8"))).toDF("warc")
    val marks = WarcIO.explodeRecords(corrupt).select("warc_type").as[String].collect()
    assert(marks.toSeq == Seq("corrupt"))
  }

  test("full circle: a crawl's fetched pages export as WARC archives and parse back exactly") {
    val corpus = graft.synth.PageSynth.pages(60L)
    val pagesDf = spark.createDataFrame(corpus.map(_.page))
    val robots = spark.createDataset(graft.synth.PageSynth.robots())(
      org.apache.spark.sql.Encoders.product[graft.model.RobotsEntry])
    val lake = graft.lake.CrawlLake.forCrawl(
      java.nio.file.Files.createTempDirectory("graft-warc-crawl").toString, spark, buckets = 4)
    val driver = new graft.crawl.CrawlDriver(spark, lake, pagesDf, robots,
      graft.crawl.CrawlConfig(budget = 3, seenPartitions = 8, expectedPerSegment = 4096))
    try {
      driver.init(graft.synth.PageSynth.seeds(60L, 3))
      driver.run(2)
      val ok = driver.fetchLog.where($"status" === 200)
        .select($"url", date_format($"fetch_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").as("warc_date"))
      val nFetched = ok.count()
      assert(nFetched > 0)
      val rows = ok.join(pagesDf.select($"url", $"html".as("body")), Seq("url"))
      assert(rows.count() == nFetched, "every fetched url must resolve to its page body")
      val archives = WarcIO.exportArchives(rows.repartition(2).select("url", "warc_date", "body"))
      val back = WarcIO.explodeRecords(archives.drop("n_records"))
      val got = back.select("uri", "body").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      val want = rows.collect()
        .map(r => r.getAs[String]("url") -> r.getAs[Array[Byte]]("body").toSeq).toMap
      assert(got == want, "exported archives must round-trip the exact fetched bytes")
    } finally { driver.close(); lake.drop() }
  }
}
