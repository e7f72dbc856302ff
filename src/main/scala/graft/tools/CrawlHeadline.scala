package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE crawl-headline workload, shared by [[graft.Bench]] (the driver's
  * measured artifact) and [[CrawlBench]] (the standalone A/B tool) so the
  * two can never de-sync structurally (round-4 reviewer: the equivalence
  * used to be a doc comment, and drifted the day Bench gained a warmup
  * pass): a 30k-page deterministic corpus, 200 hosts with megahost skew,
  * budget 200, 64-partition seen set, 2 steady-state ticks. */
object CrawlHeadline {

  val N = 30000L
  val synthCfg: graft.synth.PageSynth.Config =
    graft.synth.PageSynth.Config(nHosts = 200, megaPct = 10, minLines = 10, extraLines = 5)

  def pages(spark: SparkSession, cpus: Int): DataFrame = {
    import spark.implicits._
    spark.range(0L, N, 1L, cpus)
      .mapPartitions(_.map(i => graft.synth.PageSynth.synthPage(i, N, synthCfg).page)).toDF()
  }

  /** One full crawl over a FRESH lake under `lakeParent` (default: the JVM
    * temp dir, matching the driver-run Bench). Returns (fetched, wall_s). */
  def runOnce(
      spark: SparkSession,
      pagesDf: DataFrame,
      cpus: Int,
      lakeParent: Option[String] = None): (Long, Double) = {
    import spark.implicits._
    val robots = spark.createDataset(Seq.empty[graft.model.RobotsEntry])
    val lakeDir = lakeParent match {
      case Some(d) =>
        java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(d), "graft-bench-lake").toString
      case None => java.nio.file.Files.createTempDirectory("graft-bench-lake").toString
    }
    val lake = graft.lake.CrawlLake.forCrawl(lakeDir, spark, buckets = cpus)
    val driver = new graft.crawl.CrawlDriver(spark, lake, pagesDf, robots,
      graft.crawl.CrawlConfig(budget = 200, seenPartitions = 64,
        expectedPerSegment = 1 << 14, collectStats = false))
    driver.init((0L until N).map(i =>
      graft.model.Seed(graft.synth.PageSynth.url(i, synthCfg), 0, graft.synth.PageSynth.warcTs(0))))
    val t0 = System.nanoTime()
    val stats = driver.run(2)
    val wall = (System.nanoTime() - t0) / 1e9
    (stats.map(_.fetched).sum, wall)
  }
}
