package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.crawl.{CrawlDriver, TickStats}

/** End-to-end streaming form of the crawl loop (SURVEY.md §1.2 E1→E4 as ONE
  * continuous query): a tick source drives `CrawlDriver.tick()` through
  * `foreachBatch`, reproducing the reference's EventBridge
  * `rate(720 minutes)` schedule (`stack.ts:205-210`) — production parity is
  * `tickSource = rateTicks(spark)` with
  * `Trigger.ProcessingTime("720 minutes")`; tests drive a MemoryStream tick
  * per micro-batch and assert parity with the batch loop.
  *
  * Exactness note: the LAKE is the source of truth, not the stream
  * checkpoint. Each micro-batch runs one engine tick whose own snapshot
  * commit is atomic (CrawlLake), so a replayed micro-batch after a stream
  * restart simply advances the crawl one further tick — "at least one tick
  * per trigger", never a torn or duplicated tick. Crawl-order/resume
  * exactness is proven on the snapshot loop (CrawlDriverSpec) and carries
  * over unchanged because this wrapper adds no state of its own.
  */
object StreamingCrawl {

  /** Unbounded production tick source: one row per trigger interval. */
  def rateTicks(spark: SparkSession): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()

  /** Start the continuous crawl: one engine tick per micro-batch of
    * `tickSource`. The tick payload itself is ignored — ticks are pure
    * schedule edges, exactly like the reference's empty EventBridge events
    * (`stack.ts:205-210`). `onTick` observes per-tick stats (metrics sink).
    */
  def start(
      driver: CrawlDriver,
      tickSource: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime("720 minutes"),
      checkpointDir: Option[String] = None,
      onTick: TickStats => Unit = _ => ()): StreamingQuery = {
    val writer = tickSource.writeStream
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        val stats = driver.tick()
        onTick(stats)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
