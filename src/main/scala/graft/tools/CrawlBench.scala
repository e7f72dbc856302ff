package graft.tools

/** Crawl-headline-only benchmark: runs [[CrawlHeadline]] — structurally THE
  * crawl section of [[graft.Bench]] — standalone, so A/B bisections measure
  * ONE thing in ONE fresh JVM (sequential sessions in one JVM carry 5x
  * variance — see BASELINE.md bench methodology). Rep 1 is COLD (measures
  * JIT too, like a fresh driver); Bench's own artifact warms up first —
  * use GRAFT_REPEAT>=2 and read the warm reps for steady-state numbers.
  *
  * Env knobs:
  *   SPARK_GRAFT_CPUS   local[N] parallelism (default 32)
  *   GRAFT_LAKE_DIR     parent dir for the lake (default
  *                      CrawlHeadline.scratchParent — /dev/shm when the
  *                      host has one, else java.io.tmpdir — matching
  *                      Bench; round-5 change: lakes are deleted after
  *                      every run, so tmpfs no longer accumulates)
  *   GRAFT_REPEAT       in-JVM repeats, fresh lake each (default 1)
  */
object CrawlBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeat = sys.env.getOrElse("GRAFT_REPEAT", "1").toInt
    val spark = graft.GraftSession.local(cpus, shufflePartitions = Some(cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = CrawlHeadline.pages(spark, cpus)
    (1 to repeat).foreach { rep =>
      val (fetched, wall) =
        CrawlHeadline.runOnce(spark, pages, cpus, lakeParent = sys.env.get("GRAFT_LAKE_DIR"))
      println(f"""{"rep":$rep,"pages_fetched":$fetched,"wall_s":$wall%.2f,"urls_per_sec":${fetched / wall}%.1f}""")
    }
    spark.stop()
  }
}
