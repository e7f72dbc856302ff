package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.crawl.{CrawlConfig, CrawlDriver}
import graft.lake.CrawlLake
import graft.model.{RobotsEntry, Seed}
import graft.synth.PageSynth

class RetrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pendingKeys(
      frontier: org.apache.spark.sql.DataFrame,
      log: org.apache.spark.sql.DataFrame,
      maxAttempts: Int,
      horizon: Option[Long]): Set[Long] =
    Retry.pendingWithRetry(frontier, log, "k", "b", "status", maxAttempts, horizon.map(lit(_)))
      .select("k").as[Long].collect().toSet

  test("retry rule: budget, success reset, TTL re-age of successes and exhausted failures") {
    val frontier = (1L to 8L).map(k => (k, s"u$k")).toDF("k", "v")
    val log = Seq(
      // k=1: one failure                   -> pending at maxAttempts=2, out at 1
      (1L, 1L, 404),
      // k=2: two failures                  -> out at maxAttempts=2 (budget spent)
      (2L, 1L, 404), (2L, 2L, 404),
      // k=3: success                       -> out (fresh) unless TTL ages it
      (3L, 1L, 200),
      // k=4: success then a later failure  -> budget RESET by the success
      //      (fails_since=1); out while the success is fresh, pending once
      //      it ages (horizon 9 > 1) because one retry remains
      (4L, 1L, 200), (4L, 9L, 404),
      // k=5: old exhausted failures        -> re-ages under the TTL
      (5L, 1L, 404), (5L, 2L, 404),
      // k=6: old success, 2 failures after -> aged success + spent budget +
      //      recent last failure           -> out even with TTL at horizon 9
      (6L, 1L, 200), (6L, 8L, 404), (6L, 9L, 404)
      // k=7, k=8: never fetched            -> always pending
    ).toDF("k", "b", "status")

    assert(pendingKeys(frontier, log, maxAttempts = 2, horizon = None) ==
      Set(1L, 7L, 8L))
    assert(pendingKeys(frontier, log, maxAttempts = 1, horizon = None) ==
      Set(7L, 8L))
    // TTL horizon 9: batches < 9 have aged
    assert(pendingKeys(frontier, log, maxAttempts = 2, horizon = Some(9L)) ==
      Set(1L, 2L, 3L, 4L, 5L, 7L, 8L))
  }

  test("maxAttempts=1 reproduces the anti-join and the TTL rule exactly") {
    val frontier = (1L to 40L).map(k => (k, s"u$k")).toDF("k", "v")
    // pseudo-random lineage: some keys multiple fetches, mixed statuses
    val log = (1L to 120L).map { i =>
      val k = (i * 7 % 37) + 1
      val b = i % 11
      val status = if (i % 3 == 0) 200 else 404
      (k, b, status)
    }.toDF("k", "b", "status")

    val antiJoin = frontier.join(log.select("k"), Seq("k"), "left_anti")
      .select("k").as[Long].collect().toSet
    assert(pendingKeys(frontier, log, maxAttempts = 1, horizon = None) == antiJoin)

    val ttl = Recrawl.pendingWithTtl(frontier, log, "k", "b", lit(6L))
      .select("k").as[Long].collect().toSet
    assert(pendingKeys(frontier, log, maxAttempts = 1, horizon = Some(6L)) == ttl)
  }

  private val N = 20L
  private def driverWith(cfg: CrawlConfig, extraSeeds: Seq[Seed]): CrawlDriver = {
    val lake = CrawlLake.forCrawl(
      Files.createTempDirectory("graft-lake-retry").toString, spark, buckets = 8)
    val pagesDf = spark.createDataFrame(PageSynth.pages(N).map(_.page))
    val robots = spark.createDataset(Seq.empty[RobotsEntry])
    val driver = new CrawlDriver(spark, lake, pagesDf, robots, cfg)
    driver.init((0L until N).map(i => Seed(PageSynth.url(i), 0, PageSynth.warcTs(0))) ++ extraSeeds)
    driver
  }
  private val missingSeeds = (0 until 3).map(i =>
    Seed(s"https://missing.example/doc$i", 0, PageSynth.warcTs(0)))

  test("driver: FAILED urls retry until the budget is spent; successes fetch once") {
    val cfg = CrawlConfig(budget = 1000, seenPartitions = 8,
      expectedPerSegment = 4096, maxDepth = 0, maxAttempts = 3)
    val driver = driverWith(cfg, missingSeeds)
    driver.run(8)
    val rows = driver.fetchLog.select("url", "status").as[(String, Int)].collect()
    val (missing, present) = rows.partition(_._1.contains("missing.example"))
    assert(present.length.toLong == N && present.forall(_._2 == 200))
    assert(missing.length == 9, s"3 missing urls x 3 attempts, got ${missing.length}")
    assert(missing.forall(_._2 == 404))
  }

  test("driver: crawl-once behavior is unchanged at maxAttempts=1 (simulator parity)") {
    val base = CrawlConfig(budget = 1000, seenPartitions = 8,
      expectedPerSegment = 4096, maxDepth = 0)
    val d1 = driverWith(base, missingSeeds)                       // default path
    val d2 = driverWith(base.copy(maxAttempts = 1), missingSeeds) // explicit 1
    d1.run(4); d2.run(4)
    def lineage(d: CrawlDriver) = d.fetchLog
      .select("url_hash", "batch_id", "status").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(lineage(d1) == lineage(d2))
    assert(lineage(d1).count(_._3 == 404) == 3) // one attempt each, no retry
  }

  test("bucketed lake: retry pending plans with zero shuffle exchanges") {
    val cfg = CrawlConfig(budget = 1000, seenPartitions = 8,
      expectedPerSegment = 4096, maxDepth = 0, maxAttempts = 3, recrawlAfterTicks = 4)
    val driver = driverWith(cfg, missingSeeds)
    driver.run(1)
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = driver.pendingAt(3L).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"retry pending should be co-partitioned by the bucket layout:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }
}
