package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.crawl.{CrawlConfig, CrawlDriver}
import graft.lake.CrawlLake
import graft.model.{RobotsEntry, Seed}
import graft.synth.PageSynth

class RecrawlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pendingWithTtl: never-fetched and stale rows pending, fresh rows not") {
    val frontier = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val log = Seq(
      (1L, 5L), (1L, 9L), // latest fetch at 9 -> fresh under horizon 8
      (2L, 3L)            // latest fetch at 3 -> stale
    ).toDF("k", "fetch_batch")
    val got = Recrawl.pendingWithTtl(frontier, log, "k", "fetch_batch", horizon = lit(8L))
      .select("k").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }

  private val N = 30L
  private def allSeeds: Seq[Seed] =
    (0L until N).map(i => Seed(PageSynth.url(i), 0, PageSynth.warcTs(0)))

  private def newDriver(cfg: CrawlConfig): CrawlDriver = {
    val lake = CrawlLake.forCrawl(
      Files.createTempDirectory("graft-lake-recrawl").toString, spark, buckets = 8)
    val pagesDf = spark.createDataFrame(PageSynth.pages(N).map(_.page))
    val robots = spark.createDataset(Seq.empty[RobotsEntry]) // allow-all
    new CrawlDriver(spark, lake, pagesDf, robots, cfg)
  }

  test("recrawl TTL: every page re-fetched exactly every K ticks; crawl-once without it") {
    val ttl = 2
    val cfg = CrawlConfig(
      budget = 1000, seenPartitions = 8, expectedPerSegment = 4096,
      recrawlAfterTicks = ttl)
    val driver = newDriver(cfg)
    driver.init(allSeeds)
    val stats = driver.run(5)
    assert(stats.size == 5, "run() must not stop during a TTL cooldown gap")

    // fetched at 1, fresh through 2, aged out at 3, fresh at 4, refetched at 5
    val perUrl = driver.fetchLog.select("url_hash", "batch_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(perUrl.size == N)
    perUrl.foreach { case (h, batches) =>
      assert(batches == Vector(1L, 3L, 5L), s"url $h fetched at $batches")
    }
    assert(stats.map(_.scheduled) == Seq(N, 0L, N, 0L, N))

    // crawl-once: same corpus, no TTL -> one fetch per url, run drains early
    val onceDriver = newDriver(cfg.copy(recrawlAfterTicks = 0))
    onceDriver.init(allSeeds)
    onceDriver.run(5)
    val onceCounts = onceDriver.fetchLog.groupBy("url_hash").count()
      .select("count").as[Long].collect()
    assert(onceCounts.length.toLong == N && onceCounts.forall(_ == 1L))
  }

  test("empty-tick fast path: compaction cadence and trajectory unchanged") {
    // seenCompactEvery=2 makes the EMPTY ticks (2 and 4) compact ticks —
    // the fast path must still fold delta lists into filter segments, so
    // the subsequent refetch ticks see the identical seen set
    val cfg = CrawlConfig(
      budget = 1000, seenPartitions = 8, expectedPerSegment = 4096,
      recrawlAfterTicks = 2, seenCompactEvery = 2)
    val driver = newDriver(cfg)
    driver.init(allSeeds)
    val stats = driver.run(5)
    assert(stats.map(_.scheduled) == Seq(N, 0L, N, 0L, N))
    val perUrl = driver.fetchLog.select("url_hash", "batch_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    assert(perUrl.size == N && perUrl.values.forall(_ == Vector(1L, 3L, 5L)))
    // the seen segments were compacted on the empty ticks: no delta-list
    // accumulation (compaction folds lists into one filter per partition)
    assert(driver.frontier.count() == N)
  }

  test("latestExtracted: exactly one CURRENT row per url under the re-crawl TTL") {
    val cfg = CrawlConfig(
      budget = 1000, seenPartitions = 8, expectedPerSegment = 4096,
      recrawlAfterTicks = 2)
    val driver = newDriver(cfg)
    driver.init(allSeeds)
    driver.run(5) // every url fetched at batches 1, 3, 5

    // append-only lineage keeps every fetch...
    val lineageCounts = driver.extracted.groupBy("url_hash").count()
      .select("count").as[Long].collect()
    assert(lineageCounts.length.toLong == N && lineageCounts.forall(_ == 3L),
      "extracted lineage should hold one row per (url, fetch)")
    // ...while the current view is put-overwrite (reference T2 semantics):
    // one row per url_hash, from the LATEST batch
    val latest = driver.latestExtracted
      .select("url_hash", "batch_id").as[(Long, Long)].collect()
    assert(latest.length.toLong == N, "latestExtracted must be one row per url")
    assert(latest.forall(_._2 == 5L), "current view must come from the last fetch batch")
    // and its payload is byte-identical to the last batch's extraction
    val lastBatch = driver.extracted.where(col("batch_id") === 5L)
      .select("url_hash", "extracted_text").as[(Long, String)].collect().toMap
    driver.latestExtracted.select("url_hash", "extracted_text").as[(Long, String)]
      .collect().foreach { case (h, txt) => assert(lastBatch(h) == txt) }

    // with extracted stored url_hash-bucketed, the arg-max aggregate runs
    // inside the bucketed scan's partitioning: no Exchange anywhere
    val plan = driver.latestExtracted.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"latestExtracted should be co-partitioned by the bucket layout:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected a bucketed extracted scan:\n$plan")
  }

  test("bucketed lake: TTL pending plans with zero shuffle exchanges") {
    val cfg = CrawlConfig(
      budget = 1000, seenPartitions = 8, expectedPerSegment = 4096,
      recrawlAfterTicks = 2)
    val driver = newDriver(cfg)
    driver.init(allSeeds)
    driver.run(1)
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // latest-fetch agg groups by the bucket key (partial agg inside the
      // bucketed scan) and the frontier left-join reuses the same
      // partitioning: no exchange anywhere on the 10^10-row side
      val plan = driver.pendingAt(3L).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"TTL pending should be co-partitioned by the bucket layout:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }
}
