package graft.util

import org.apache.spark.sql.SparkSession

/** Data-derived shuffle-partition sizing for iterative operators (guide
  * §2.2/§2.5: make partitioning scale-adaptive — derive it from the input
  * size — instead of a constant tuned for either local mode or the
  * cluster).
  *
  * Why it exists: an iterative loop (connected components, host rank)
  * launches a multi-stage shuffle chain EVERY round. With the session
  * default (3 slots per core — right for corpus-sized shuffles with skew)
  * each round of a loop over a few-hundred-KB (long, long) table schedules
  * dozens of near-empty tasks per stage; measured at sf0.1/local[32] the
  * task+stage overhead was >50% of q42/q43 (5.9 s → 2.7 s and 2.6 s →
  * 0.9 s when the loop's shuffles are sized to the data). AQE's
  * coalescing trims the reduce side but cannot trim the map side or the
  * per-stage scheduling floor, so the INITIAL partition count has to come
  * from the data.
  *
  * The sizing is a pure function of the operator's own row-count estimate
  * (the loops persist and count their edge tables anyway), so it scales
  * both directions: a 10^8-host graph gets hundreds of partitions, a
  * 50k-row bench graph gets one — nothing here is tuned to local[32].
  */
object AdaptiveShuffle {

  /** Rows per shuffle partition for narrow (few-long-column) rows:
    * ~2M rows ≈ 32-128 MB serialized — the guide's 100 MB-1 GB partition
    * band for the small end. */
  val RowsPerPartition = 2000000L

  def partitionsForRows(rows: Long): Int = {
    val n = (rows + RowsPerPartition - 1) / RowsPerPartition
    math.max(1L, n).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions` sized for `rows`
    * narrow rows, restoring the previous value after. Every ACTION inside
    * `body` plans under the sized value; frames returned out of `body`
    * must be materialized inside it (the iterative operators checkpoint
    * their results, so they are). The conf is session-scoped: queries
    * planned CONCURRENTLY on the same session from other threads would see
    * the override — the engine's iterative operators run single-threaded
    * within a job, and none is on the crawl tick path. */
  def withPartitionsForRows[T](spark: SparkSession, rows: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, partitionsForRows(rows).toString)
    try body finally spark.conf.set(key, prev)
  }
}
