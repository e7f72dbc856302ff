package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-host politeness budget + priority queue (north rule), generalizing
  * the reference's `downloadUrls.slice(0, 5)` cost guard
  * (`scrape-pdfs-from-website/lambda.ts:74-78`): the reference admits the
  * first 5 matching links *in document order* from its single host; the
  * engine admits the first `budget` per host in the total schedule order
  *
  *   (priority, depth, discovery_ts, seq_in_page, url_hash)
  *
  * — a complete tie-break chain (SURVEY.md §7.3(a)) so the schedule is
  * identical at any partition count.
  *
  * Scale notes (10^10-frontier):
  *  - `row_number().over(partitionBy(host))` compiles to Exchange(host) +
  *    Sort + Window. Spark ≥3.5 plans a WindowGroupLimit below the
  *    exchange: each map task keeps only its local top-`budget` rows per
  *    host BEFORE shuffling, so the shuffle moves O(hosts·budget) rows,
  *    not the whole frontier. Verified in PolitenessSpec via explain().
  *  - megahost skew: the pre-shuffle group limit also caps what any single
  *    reducer receives per host to (mapTasks·budget), which defuses the
  *    classic skewed-window OOM; AQE skew handling stays on as backstop.
  */
object Politeness {

  val scheduleOrder: Seq[org.apache.spark.sql.Column] =
    Seq(col("priority"), col("depth"), col("discovery_ts"), col("seq_in_page"), col("url_hash"))

  /** Admit ≤ budget rows per host, ranked by the schedule order; output
    * carries `host_rank` (1-based within host). */
  def schedule(pending: DataFrame, budget: Int): DataFrame = {
    val w = Window.partitionBy(col("host")).orderBy(scheduleOrder: _*)
    pending
      .withColumn("host_rank", row_number().over(w))
      .where(col("host_rank") <= budget)
  }

  /** The deterministic global crawl order of one batch (for lineage and
    * golden-order comparison): batch_id first, then the schedule chain. */
  def globalOrder(scheduled: DataFrame): DataFrame =
    scheduled.orderBy(col("batch_id") +: scheduleOrder: _*)
}
