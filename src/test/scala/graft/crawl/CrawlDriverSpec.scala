package graft.crawl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.CrawlLake
import graft.operators.RobotsMatcher
import graft.sim.ReferenceSimulator
import graft.synth.PageSynth
import graft.util.UrlCanonicalizer

class CrawlDriverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 150L
  private lazy val corpus = PageSynth.pages(N)
  private lazy val robotsEntries = PageSynth.robots()
  private lazy val robotsMap = robotsEntries.map(e => e.host -> e).toMap
  private lazy val seedUrls = PageSynth.seeds(N, 3).map(_.url)

  private def newDriver(cfg: CrawlConfig, pagesPartitions: Int = 4): (CrawlDriver, CrawlLake) = {
    val lake = CrawlLake.forCrawl(Files.createTempDirectory("graft-lake").toString, spark, buckets = 8)
    val pagesDf = spark.createDataFrame(corpus.map(_.page)).repartition(pagesPartitions)
    val robotsDs = spark.createDataset(robotsEntries)
    (new CrawlDriver(spark, lake, pagesDf, robotsDs, cfg), lake)
  }

  private def simResult(budget: Int, ticks: Int) =
    ReferenceSimulator.crawl(corpus, seedUrls, budget, ticks, robotsMap)

  private def engineOrder(d: CrawlDriver): Vector[(Long, Long, Int)] =
    d.crawlOrder().select("batch_id", "url_hash", "status")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toVector

  test("crawl order + seen set + extracted text match the sequential oracle exactly") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val (driver, _) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(3)

    val sim = simResult(budget = 2, ticks = 3)

    val simOrder = sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status))
    assert(engineOrder(driver) == simOrder)

    val engineSeen = driver.frontier.select("url_hash").as[Long].collect().toSet
    assert(engineSeen == sim.seenHashes)

    val engineTexts = driver.extracted
      .select("url_hash", "extracted_text").as[(Long, String)].collect().toMap
    assert(engineTexts == sim.extractedTexts) // byte-identical per url
  }

  test("host cooldown: cross-tick rate limit matches the sequential oracle exactly") {
    val cooldown = 2
    val cfg = CrawlConfig(
      budget = 2, seenPartitions = 8, expectedPerSegment = 4096, hostCooldownTicks = cooldown)
    val (driver, _) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    val stats = driver.run(6)
    val sim = ReferenceSimulator.crawl(
      corpus, seedUrls, budget = 2, ticks = stats.size, robotsMap, cooldownTicks = cooldown)
    assert(engineOrder(driver) == sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))

    // the limiter actually bites: no host is fetched in two ticks closer
    // than the cooldown window
    val byHost = driver.fetchLog.select("host", "batch_id").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    byHost.foreach { case (host, batches) =>
      batches.sliding(2).foreach {
        case Array(a, b) => assert(b - a > cooldown, s"$host fetched at ticks $a and $b")
        case _ => ()
      }
    }
    // and run() does not stop on a cooldown-induced empty tick
    assert(stats.count(_.scheduled == 0) >= 1 || stats.size == 6,
      s"expected cooldown gaps in ${stats.map(_.scheduled)}")
  }

  test("robots rules are enforced (disallowed host pages never scheduled)") {
    val cfg = CrawlConfig(budget = 3, seenPartitions = 8, expectedPerSegment = 4096)
    val (driver, _) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 5))
    driver.run(3)
    val fetchedUrls = driver.fetchLog.select("url").as[String].collect()
    fetchedUrls.foreach { u =>
      val host = UrlCanonicalizer.host(u)
      assert(RobotsMatcher.allowedUrl(robotsMap, host, u), s"robots violation: $u")
      assert(host != PageSynth.hostName(2), s"disallow-all host fetched: $u")
    }
    // host1 pages under /page/ are blocked, so only its document urls appear
    fetchedUrls.filter(_.contains(PageSynth.hostName(1))).foreach { u =>
      assert(!RobotsMatcher.pathOf(u).startsWith("/page/"), u)
    }
  }

  test("politeness: never more than budget fetches per host per tick") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val (driver, _) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 4))
    driver.run(4)
    val over = driver.fetchLog
      .groupBy("batch_id", "host").count().where($"count" > 2).count()
    assert(over == 0)
  }

  test("crawl order is invariant to partitioning and shuffle width") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val (d1, _) = newDriver(cfg, pagesPartitions = 1)
    driverRun(d1)
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    val (d2, _) = try { val t = newDriver(cfg, pagesPartitions = 7); driverRun(t._1); t }
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    assert(engineOrder(d1) == engineOrder(d2))
    assert(d1.frontier.select("url_hash").as[Long].collect().toSet ==
      d2.frontier.select("url_hash").as[Long].collect().toSet)
  }

  private def driverRun(d: CrawlDriver): Unit = {
    d.init(PageSynth.seeds(N, 3)); d.run(3); ()
  }

  test("kill-and-resume ≡ straight-through (checkpoint exactness)") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    // straight-through: 5 ticks
    val (dFull, _) = newDriver(cfg)
    dFull.init(PageSynth.seeds(N, 3))
    dFull.run(5)
    // interrupted: 3 ticks, then a brand-new driver over the same lake
    val (dPart, lake) = newDriver(cfg)
    dPart.init(PageSynth.seeds(N, 3))
    dPart.run(3)
    val resumed = new CrawlDriver(
      spark, lake, spark.createDataFrame(corpus.map(_.page)), spark.createDataset(robotsEntries), cfg)
    resumed.run(2)
    assert(engineOrder(dFull) == engineOrder(resumed))
    assert(dFull.extracted.count() == resumed.extracted.count())
    assert(dFull.frontier.select("url_hash").as[Long].collect().toSet ==
      resumed.frontier.select("url_hash").as[Long].collect().toSet)
  }

  test("reference-literal parity: next-tick schedule = slice(0,5) of filtered doc-order links") {
    // one seed page, the reference's filter + budget; the engine's tick-2
    // schedule for that host must equal the reference's admitted order
    // (filter -> slice(0,5) -> split/pop), per BASELINE.md.
    val seedPage = corpus(7) // hub page (7 % 3 != 0)
    val cfg = CrawlConfig(
      budget = 5, seenPartitions = 8, expectedPerSegment = 4096,
      linkFilterContains = Some("DownloadDocumentPDF"))
    val lake = CrawlLake.forCrawl(Files.createTempDirectory("graft-lake-ref").toString, spark, buckets = 8)
    val driver = new CrawlDriver(
      spark, lake, spark.createDataFrame(corpus.map(_.page)),
      spark.createDataset(Seq.empty[graft.model.RobotsEntry]), cfg)
    driver.init(Seq(graft.model.Seed(seedPage.page.url, 0, ReferenceSimulator.tickTs(0))))
    driver.run(2)

    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val admitted = ReferenceSimulator.referenceTick(seedPage.links, 5, seen)

    val tick2 = driver.fetchLog.where($"batch_id" === 2)
      .join(driver.frontier.select("url_hash", "seq_in_page"), Seq("url_hash"))
      .orderBy("seq_in_page").select("url").as[String].collect().toVector
    assert(tick2 == admitted.map(_._2).map(UrlCanonicalizer.canonicalize).toVector)

    // seen-set parity: engine key = hash(canonical url); reference key =
    // DocumentId. Bijection holds on this corpus (DocumentId=i <-> url(i)).
    val engineTick2Hashes = tick2.map(UrlCanonicalizer.urlHash).toSet
    val refHashes = seen.values.map(UrlCanonicalizer.urlHash).toSet
    assert(engineTick2Hashes == refHashes)
  }

  test("cuckoo seen-set variant crawls identically to bloom") {
    val bloomCfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val cuckooCfg = bloomCfg.copy(seenKind = "cuckoo")
    val (dBloom, _) = newDriver(bloomCfg)
    dBloom.init(PageSynth.seeds(N, 3)); dBloom.run(3)
    val (dCuckoo, _) = newDriver(cuckooCfg)
    dCuckoo.init(PageSynth.seeds(N, 3)); dCuckoo.run(3)
    assert(engineOrder(dBloom) == engineOrder(dCuckoo))
    assert(dBloom.frontier.count() == dCuckoo.frontier.count())
  }

  test("crawl_delay tightens the per-host budget; engine matches the oracle") {
    // host0's entry overridden with a 30 s delay -> floor(60/30) = 2/tick
    val slowRobots = robotsEntries.map { e =>
      if (e.host == PageSynth.hostName(0)) e.copy(crawl_delay = 30.0) else e
    }
    val cfg = CrawlConfig(budget = 5, seenPartitions = 8, expectedPerSegment = 4096)
    val lake = CrawlLake.forCrawl(Files.createTempDirectory("graft-lake-delay").toString, spark, buckets = 8)
    val driver = new CrawlDriver(
      spark, lake, spark.createDataFrame(corpus.map(_.page)),
      spark.createDataset(slowRobots), cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(3)
    val perHostTick = driver.fetchLog.groupBy("batch_id", "host").count()
      .as[(Long, String, Long)].collect()
    perHostTick.filter(_._2 == PageSynth.hostName(0)).foreach { case (b, h, n) =>
      assert(n <= 2, s"crawl_delay violated at tick $b: $n fetches on $h")
    }
    val sim = ReferenceSimulator.crawl(
      corpus, seedUrls, budget = 5, ticks = 3,
      slowRobots.map(e => e.host -> e).toMap)
    assert(engineOrder(driver) == sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))
  }

  test("bucketed lake: PENDING anti-join plans with zero shuffle exchanges") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val (driver, _) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(2)
    // force SMJ so the assertion is about co-partitioning, not a trivially
    // exchange-free broadcast join
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = driver.pending.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"frontier ∖ fetch_log should be co-partitioned by the bucket layout:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("bucketed pages corpus: fetch join plans with no exchange on the pages side") {
    // the 100 TB fetch layout: pages stored bucketed by url_hash; when the
    // scheduled batch is too big to broadcast, the SMJ must leave the corpus
    // side unshuffled (only the small batch exchanges to match)
    val pagesWithHash = spark.createDataFrame(corpus.map(_.page))
      .withColumn("url_hash", graft.functions.GraftFunctions.url_hash64($"url"))
    graft.lake.BucketedFrontier.writeBucketed(pagesWithHash, "graft_pages_spec", buckets = 8)
    val bucketedPages = spark.table("graft_pages_spec")

    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val lake = CrawlLake.forCrawl(
      Files.createTempDirectory("graft-lake-bp").toString, spark, buckets = 8)
    val driver = new CrawlDriver(
      spark, lake, bucketedPages, spark.createDataset(robotsEntries), cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(3)
    // identical crawl to the plain-DataFrame corpus (oracle)
    val sim = simResult(budget = 2, ticks = 3)
    assert(engineOrder(driver) == sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))

    // plan shape: SMJ whose pages side has no exchange above the scan
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = bucketedPages.select($"url_hash", $"html")
        .join(driver.frontier.select("url_hash"), Seq("url_hash"), "inner")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // exactly zero exchanges: both sides are 8-bucket tables
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("seen deltas are exact lists (bytes ∝ admitted); compaction keeps the oracle exact") {
    val cfg = CrawlConfig(
      budget = 2, seenPartitions = 8, expectedPerSegment = 4096, seenCompactEvery = 3)
    val (driver, lake) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(4) // ticks 1..4; compaction replaces `seen` at tick 3
    val sim = simResult(budget = 2, ticks = 4)
    assert(engineOrder(driver) == sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))

    // after the tick-3 compaction + the tick-4 delta append, `seen` lists
    // exactly two dirs (compacted filters + one delta) — not one per tick
    val seenDirs = lake.manifest(lake.latestSnapshotId.get)("seen")
    assert(seenDirs.size == 2, seenDirs)

    // delta blobs are raw sorted hashes: 16 bytes fixed header + 8 B/key —
    // per-tick seen bytes track the admitted count, never P × filter size
    val segs = lake.read(
      "seen", org.apache.spark.sql.Encoders.product[graft.seen.SeenSet.Segment].schema)
      .as[graft.seen.SeenSet.Segment].collect()
    val (lists, filters) = segs.partition(s => s.segment.length == 8 + 8 * s.n_items)
    assert(lists.nonEmpty && filters.nonEmpty, s"want both kinds, got ${segs.length} segments")
    assert(lists.map(_.segment.length.toLong).sum < filters.map(_.segment.length.toLong).sum / 4)
  }

  test("lake compaction bounds partition growth, preserves the oracle, and resumes exactly") {
    val cfg = CrawlConfig(
      budget = 2, seenPartitions = 8, expectedPerSegment = 4096, lakeCompactEvery = 2)
    val (driver, lake) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(4) // compactions after ticks 2 and 4
    val sim = simResult(budget = 2, ticks = 4)
    assert(engineOrder(driver) == sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))

    // bucketed tables hold one compacted partition (+ ticks since, here 0)
    assert(lake.partitionIds("frontier").size <= 2, lake.partitionIds("frontier"))
    assert(lake.partitionIds("fetch_log").size <= 2, lake.partitionIds("fetch_log"))
    assert(lake.partitionIds("extracted").size <= 2, lake.partitionIds("extracted"))

    // resume over the compacted lake (fresh CrawlLake = fresh-JVM path)
    val lake2 = graft.lake.CrawlLake.forCrawl(lake.root, spark, buckets = 8)
    val resumed = new CrawlDriver(
      spark, lake2, spark.createDataFrame(corpus.map(_.page)),
      spark.createDataset(robotsEntries), cfg)
    resumed.run(1)
    val simFull = simResult(budget = 2, ticks = 5)
    assert(engineOrder(resumed) == simFull.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))
  }

  test("long run: 20+ ticks with compaction keeps files bounded and the oracle exact") {
    // budget 1 stretches the 150-page corpus across ~20 ticks; compaction
    // every 5 ticks + seen folding every 4 must keep partition/dir/segment
    // counts BOUNDED (constant + since-last-compaction), not tick-linear
    val cfg = CrawlConfig(
      budget = 1, seenPartitions = 8, expectedPerSegment = 4096,
      seenCompactEvery = 4, lakeCompactEvery = 5)
    val (driver, lake) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    val stats = driver.run(25)
    assert(stats.size >= 20, s"expected a 20+-tick crawl, got ${stats.size}")

    val sim = simResult(budget = 1, ticks = stats.size)
    assert(engineOrder(driver) == sim.crawlOrder.map(r => (r.batchId, r.urlHash, r.status)))

    // bucketed tables: 1 compacted partition + at most lakeCompactEvery tick
    // partitions since the last fold
    assert(lake.partitionIds("frontier").size <= 1 + cfg.lakeCompactEvery,
      lake.partitionIds("frontier"))
    assert(lake.partitionIds("fetch_log").size <= 1 + cfg.lakeCompactEvery,
      lake.partitionIds("fetch_log"))
    assert(lake.partitionIds("extracted").size <= 1 + cfg.lakeCompactEvery,
      lake.partitionIds("extracted"))
    // dir tables: seen = filters + deltas since the last fold
    val m = lake.manifest(lake.latestSnapshotId.get)
    assert(m("seen").size <= 1 + cfg.seenCompactEvery, m("seen"))
  }

  test("soak: TTL + bounded retry + compaction + enrich together, resume-exact") {
    // every continuous-operation feature ON at once — the interaction
    // surface no single-feature spec covers: re-crawl TTL ages successes
    // AND exhausted failures, the retry budget gates per-epoch attempts,
    // both compactions fold mid-run, enrichment widens the bucketed
    // extracted schema
    val nSoak = 40L
    val ttl = 3
    val soakCorpus = PageSynth.pages(nSoak)
    val missing = (0 until 3).map(i =>
      graft.model.Seed(s"https://missing.example/doc$i", 0, PageSynth.warcTs(0)))
    val cfg = CrawlConfig(
      budget = 1000, seenPartitions = 8, expectedPerSegment = 4096,
      maxDepth = 0, enrich = true, maxAttempts = 2, recrawlAfterTicks = ttl,
      seenCompactEvery = 3, lakeCompactEvery = 4)
    def mkDriver(root: String): CrawlDriver = {
      val lake = CrawlLake.forCrawl(root, spark, buckets = 8, enrich = true)
      new CrawlDriver(spark, lake,
        spark.createDataFrame(soakCorpus.map(_.page)),
        spark.createDataset(Seq.empty[graft.model.RobotsEntry]), cfg)
    }
    def lineage(d: CrawlDriver) = d.fetchLog
      .select("url_hash", "batch_id", "status").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._2)).toVector

    // run A: straight through 12 ticks
    val rootA = Files.createTempDirectory("graft-soak-a").toString
    val a = mkDriver(rootA)
    a.init((0L until nSoak).map(i =>
      graft.model.Seed(PageSynth.url(i), 0, PageSynth.warcTs(0))) ++ missing)
    val statsA = a.run(12)
    assert(statsA.size == 12)

    val byUrl = lineage(a).groupBy(_._1)
    val missingHashes = missing.map(s => UrlCanonicalizer.urlHash(s.url)).toSet
    byUrl.foreach { case (h, rows) =>
      if (missingHashes(h)) {
        // never succeeds: an initial maxAttempts burst, then at most one
        // probe per TTL window (re-aged failures), never hammered
        assert(rows.forall(_._3 == 404))
        assert(rows.length >= cfg.maxAttempts)
        assert(rows.length <= cfg.maxAttempts + 12 / ttl + 1, rows.mkString(","))
      } else {
        // only successes, re-fetched no sooner than the TTL
        assert(rows.forall(_._3 == 200))
        rows.map(_._2).sliding(2).foreach {
          case Vector(b1, b2) => assert(b2 - b1 >= ttl, s"url $h refetched at $b1 -> $b2")
          case _ => ()
        }
      }
    }
    // current view: exactly one row per fetched url, from its last batch
    val latest = a.latestExtracted.select("url_hash", "batch_id")
      .as[(Long, Long)].collect().toMap
    val lastSuccess = byUrl.collect {
      case (h, rows) if rows.exists(_._3 == 200) => h -> rows.filter(_._3 == 200).map(_._2).max
    }
    assert(latest == lastSuccess)
    // enrichment columns survived the bucketed write
    val enriched = a.extractedFull
    assert(Seq("simhash", "minhash_band0", "fingerprint", "quality")
      .forall(enriched.columns.contains), enriched.columns.mkString(","))

    // run B: kill after 6 ticks, resume with a FRESH driver (fresh-JVM
    // path over the same lake), 6 more — must be bit-identical to run A
    val rootB = Files.createTempDirectory("graft-soak-b").toString
    val b1 = mkDriver(rootB)
    b1.init((0L until nSoak).map(i =>
      graft.model.Seed(PageSynth.url(i), 0, PageSynth.warcTs(0))) ++ missing)
    b1.run(6)
    val b2 = mkDriver(rootB)
    b2.run(6)
    assert(lineage(b2) == lineage(a), "kill-and-resume soak must equal straight-through")
  }

  test("tick stats are coherent and lineage covers every schedule") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val (driver, _) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    val stats = driver.run(3)
    stats.foreach { s =>
      assert(s.scheduled == s.fetched + s.failed)
    }
    val logCount = driver.fetchLog.count()
    assert(logCount == stats.map(_.scheduled).sum)
    assert(driver.extracted.count() == stats.map(_.fetched).sum)
  }

  test("resuming with a different seenPartitions fails fast (seen-geometry drift guard)") {
    // round-5 review: segments are keyed by pmod(url_hash, P); resuming
    // with a grown P passed every range check and silently readmitted
    // already-seen URLs (candidates cogrouped with the wrong segment)
    val root = Files.createTempDirectory("graft-pdrift").toString
    val pagesDf = spark.createDataFrame(corpus.map(_.page))
    val robotsDs = spark.createDataset(Seq.empty[graft.model.RobotsEntry])
    def mk(p: Int) = new CrawlDriver(
      spark, CrawlLake.forCrawl(root, spark, buckets = 8), pagesDf, robotsDs,
      CrawlConfig(budget = 2, seenPartitions = p, expectedPerSegment = 4096))
    mk(8).init(PageSynth.seeds(N, 3))
    val e = intercept[IllegalArgumentException](mk(16))
    assert(e.getMessage.contains("seenPartitions=8"))
    mk(8).tick() // same P resumes fine
  }

  test("frontierSince: admission delta == key-set diff; expired base throws, never lies") {
    val cfg = CrawlConfig(budget = 2, seenPartitions = 8, expectedPerSegment = 4096)
    val (driver, lake) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 3))
    driver.run(2)
    val snap = lake.latestSnapshotId.get
    val atSnap = driver.frontier.select("url_hash").as[Long].collect().toSet
    driver.run(2)
    val full = driver.frontier.select("url_hash").as[Long].collect().toSet
    val delta = driver.frontierSince(snap).select("url_hash").as[Long].collect().toSet
    assert(delta.nonEmpty && delta == full -- atSnap)
    // after a frontier compaction the base snapshot is expired: the delta
    // must fail loudly (expired time travel), never return a wrong set
    lake.compactBucketed("frontier")
    intercept[IllegalStateException](driver.frontierSince(snap).count())
  }

  test("extractedSince: CDC delta == full-diff, across lake compaction and TTL re-extractions") {
    // TTL re-extracts pages (multiple rows per url_hash at different
    // batches) and lakeCompactEvery folds the tick partitions that carried
    // the early rows — the delta must still be exactly full ∖ snapshot
    val cfg = CrawlConfig(
      budget = 1000, seenPartitions = 8, expectedPerSegment = 4096,
      maxDepth = 0, recrawlAfterTicks = 2, lakeCompactEvery = 3)
    val (driver, lake) = newDriver(cfg)
    driver.init(PageSynth.seeds(N, 40))
    driver.run(3)
    val snap = lake.latestSnapshotId.get
    // capture the snapshot's row set NOW — later compactions reclaim the
    // physical partitions, so this is not re-derivable afterwards
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("url_hash", "batch_id").as[(Long, Long)].collect().toSet
    val atSnap = rows(driver.extracted)
    driver.run(5) // crosses compactions at batch 3 and 6
    val full = rows(driver.extracted)
    val delta = rows(driver.extractedSince(snap))
    assert(delta.nonEmpty, "TTL re-extraction must have produced new rows")
    assert(delta == full -- atSnap, "delta view must equal the set difference")
    // pinned upper bound: the same delta when until = latest explicitly
    assert(rows(driver.extractedSince(snap, lake.latestSnapshotId)) == delta)
    // consumers join the delta on url_hash with no Exchange on the lake side
    assert(delta.map(_._1).subsetOf(full.map(_._1)))
  }

  test("url scope: out-of-scope discovered links never enter frontier or fetch log") {
    val cfg0 = CrawlConfig(budget = 3, seenPartitions = 8, expectedPerSegment = 4096)
    val seeds = PageSynth.seeds(N, 3)
    val seedHosts = seeds.map(s => UrlCanonicalizer.host(UrlCanonicalizer.canonicalize(s.url))).toSet

    // pick a host the unscoped crawl discovers but that seeds no crawl
    val (base, baseLake) = newDriver(cfg0)
    val victim =
      try {
        base.init(seeds)
        base.run(3)
        base.frontier.select("host").as[String].collect().toSet
          .diff(seedHosts).minOption
          .getOrElse(fail("unscoped crawl discovered no non-seed host"))
      } finally { base.close(); baseLake.drop() }

    val rules = graft.operators.UrlScope.Rules(blockedHostSuffixes = Set(victim))
    val (driver, lake) = newDriver(cfg0.copy(scope = Some(rules)))
    try {
      driver.init(seeds)
      driver.run(3)
      val frontierHosts = driver.frontier.select("host").as[String].collect()
      assert(!frontierHosts.contains(victim), s"blocked host $victim reached the frontier")
      val fetched = driver.fetchLog.select("url").as[String].collect()
      assert(!fetched.exists(u => UrlCanonicalizer.host(u) == victim),
        s"blocked host $victim was fetched")
      // the gate is a filter, not a rewrite: every surviving frontier row
      // passes the rules
      val inScope = driver.frontier
        .where(!graft.operators.UrlScope.inScope(col("url"), rules))
        .count()
      assert(inScope == 0L)
    } finally { driver.close(); lake.drop() }
  }
}
