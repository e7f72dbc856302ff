package graft.tools

import org.apache.spark.sql.SparkSession

/** Crawl-headline-only benchmark: byte-for-byte the crawl section of
  * [[graft.Bench]] (same 30k-page synthetic corpus, same CrawlConfig, same
  * session conf), runnable standalone so A/B bisections measure ONE thing
  * in ONE fresh JVM (sequential sessions in one JVM carry 5x variance —
  * see BASELINE.md bench methodology).
  *
  * Env knobs:
  *   SPARK_GRAFT_CPUS   local[N] parallelism (default 32)
  *   GRAFT_CRAWL_N      corpus size (default 30000)
  *   GRAFT_LAKE_DIR     parent dir for the lake (default java.io.tmpdir,
  *                      matching Bench; set /dev/shm/... to isolate from
  *                      ext4 writeback noise)
  *   GRAFT_REPEAT       in-JVM repeats, fresh lake each (default 1; >1 only
  *                      for JIT-warm exploratory runs, not A/B numbers)
  */
object CrawlBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("GRAFT_CRAWL_N", "30000").toLong
    val repeat = sys.env.getOrElse("GRAFT_REPEAT", "1").toInt
    val spark = graft.GraftSession.local(cpus.toInt, shufflePartitions = Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    (1 to repeat).foreach { rep =>
      val cfg = graft.synth.PageSynth.Config(nHosts = 200, megaPct = 10, minLines = 10, extraLines = 5)
      val pages = spark.range(0L, n, 1L, cpus.toInt)
        .mapPartitions(_.map(i => graft.synth.PageSynth.synthPage(i, n, cfg).page)).toDF()
      val robots = spark.createDataset(Seq.empty[graft.model.RobotsEntry])
      val lakeDir = sys.env.get("GRAFT_LAKE_DIR") match {
        case Some(d) =>
          java.nio.file.Files.createTempDirectory(java.nio.file.Paths.get(d), "graft-bench-lake").toString
        case None => java.nio.file.Files.createTempDirectory("graft-bench-lake").toString
      }
      val lake = graft.lake.CrawlLake.forCrawl(lakeDir, spark, buckets = cpus.toInt)
      val driver = new graft.crawl.CrawlDriver(spark, lake, pages, robots,
        graft.crawl.CrawlConfig(budget = 200, seenPartitions = 64,
          expectedPerSegment = 1 << 14, collectStats = false))
      driver.init((0L until n).map(i =>
        graft.model.Seed(graft.synth.PageSynth.url(i, cfg), 0, graft.synth.PageSynth.warcTs(0))))
      val t0 = System.nanoTime()
      val stats = driver.run(2)
      val wall = (System.nanoTime() - t0) / 1e9
      val fetched = stats.map(_.fetched).sum
      println(f"""{"rep":$rep,"pages_fetched":$fetched,"wall_s":$wall%.2f,"urls_per_sec":${fetched / wall}%.1f}""")
    }
    spark.stop()
  }
}
