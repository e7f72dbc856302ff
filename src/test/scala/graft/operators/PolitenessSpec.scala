package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The politeness window's SCALE contract: the per-host budget must plan a
  * pre-shuffle WindowGroupLimit (each map task forwards ≤ budget rows per
  * host, defusing the skewed-megahost window), and the crawl_delay
  * tightening must not silently drop it — the CASE-expression cap is not a
  * literal, so without the explicit literal conjunct Spark's
  * InferWindowGroupLimit never fired on the REAL crawl path (robots always
  * rides along there; round-5 review — the scaladoc claimed an assertion
  * that didn't exist). */
class PolitenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pendingDf(withDelay: Boolean) = {
    val base = (0L until 2000L).map { i =>
      (i, s"https://h${i % 7}.com/p$i", s"h${i % 7}.com", 0, new java.sql.Timestamp(0L), i, 0L, 0.0)
    }.toDF("url_hash", "url", "host", "depth", "discovery_ts", "seq_in_page", "src_hash", "priority")
    if (withDelay) base.withColumn("crawl_delay",
      when(col("host") === "h0.com", 30.0).otherwise(lit(null).cast("double")))
    else base
  }

  test("schedule plans a pre-shuffle WindowGroupLimit with AND without crawl_delay") {
    for (withDelay <- Seq(false, true)) {
      val plan = Politeness.schedule(pendingDf(withDelay), budget = 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"withDelay=$withDelay: no pre-shuffle WindowGroupLimit in plan\n$plan")
    }
  }

  test("crawl_delay tightens the admitted count per host; null delay keeps the budget") {
    val out = Politeness.schedule(pendingDf(withDelay = true), budget = 5)
      .groupBy("host").count().as[(String, Long)].collect().toMap
    // h0: delay 30s -> floor(60/30) = 2 fetches; others: full budget 5
    assert(out("h0.com") == 2L, out.toString)
    (1 to 6).foreach(i => assert(out(s"h$i.com") == 5L, out.toString))
    // and the rank chain is the documented schedule order (seq_in_page here)
    val h1 = Politeness.schedule(pendingDf(withDelay = true), budget = 5)
      .where(col("host") === "h1.com").select("seq_in_page").as[Long].collect().sorted
    assert(h1.toSeq == Seq(1L, 8L, 15L, 22L, 29L))
  }
}
