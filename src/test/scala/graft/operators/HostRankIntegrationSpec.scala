package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions._
import graft.synth.PageSynth

/** End-to-end composition: synthetic pages → link extraction → host link
  * graph → integer OPIC ranks → frontier prioritization → politeness
  * scheduling. Demonstrates that [[HostRank]] plugs into the engine's
  * existing column contract (`priority` ranks ahead of everything in
  * [[Politeness.scheduleOrder]]) without driver changes.
  */
class HostRankIntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = PageSynth.pages(400L)
  private lazy val pagesDf = spark.createDataFrame(corpus.map(_.page)).cache()

  test("host graph from extracted links ranks the megahost on top") {
    val edges = pagesDf
      .select(
        xxhash64(url_host(col("url"))).as("src"),
        explode(extract_links(col("html"), col("url"))).as("link"))
      .select(col("src"), xxhash64(url_host(col("link"))).as("dst"))
    val ranks = HostRank.hostRank(edges, iters = 3)
    val collected = ranks.as[(Long, Long)].collect().toMap
    assert(collected.nonEmpty)

    // host0 is the synth megahost (~40% of pages): it receives by far the
    // most in-links, so its integer OPIC rank must be the strict maximum
    val megaHash = pagesDf
      .where(url_host(col("url")) === "host0.example.com")
      .select(xxhash64(url_host(col("url")))).as[Long].head()
    val megaRank = collected(megaHash)
    assert(collected.forall { case (h, r) => h == megaHash || r < megaRank },
      s"megahost not top-ranked: $megaRank vs max ${collected.values.max}")
  }

  test("prioritize + schedule: higher-ranked hosts come first in the batch order") {
    val edges = pagesDf
      .select(
        xxhash64(url_host(col("url"))).as("src"),
        explode(extract_links(col("html"), col("url"))).as("link"))
      .select(col("src"), xxhash64(url_host(col("link"))).as("dst"))
    val ranks = HostRank.hostRank(edges, iters = 3)

    val pending = pagesDf
      .select(
        url_hash64(col("url")).as("url_hash"),
        col("url"),
        url_host(col("url")).as("host"),
        xxhash64(url_host(col("url"))).as("host_hash"),
        lit(0).as("depth"),
        col("warc_ts").as("discovery_ts"),
        lit(0L).as("seq_in_page"))
    // rank → priority: scheduleOrder sorts priority ASCENDING, so negate
    val prioritized = HostRank.prioritize(pending, ranks)
      .withColumn("priority", -col("host_rank").cast("double"))
      .drop("host_rank")

    val scheduled = Politeness.schedule(prioritized, budget = 2)
    // politeness budget respected per host
    val perHost = scheduled.groupBy("host").count().as[(String, Long)].collect()
    assert(perHost.forall(_._2 <= 2))
    // the global batch order (priority first) starts with the top-ranked
    // host's rows
    val ordered = scheduled
      .orderBy(Politeness.scheduleOrder: _*)
      .select("host").as[String].collect()
    assert(ordered.take(2).forall(_ == "host0.example.com"),
      s"expected megahost first, got ${ordered.take(4).toSeq}")
  }
}
