package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-write-wins "current" view over an append-only table — put-OVERWRITE
  * parity with the reference's results sink (`db.put` keyed by JobId
  * overwrites, `send-textract-result-to-dynamo/lambda.ts:207-223`), which
  * the engine's append-only `extracted` table needs once the re-crawl TTL
  * ([[Recrawl]]) starts appending one row per re-fetch: a consumer joining
  * `extracted` directly would see duplicates per url_hash.
  *
  * Scale shape: one hash aggregate on the key — `max_by(struct(cols), ord)`
  * runs partial (map-side) aggregation, so only one candidate row per
  * (partition, key) reaches the shuffle; stored bucketed by the key (the
  * recommended layout for `extracted` at 10^10 rows, like frontier), the
  * aggregate plans with NO Exchange at all — the same co-partitioned shape
  * as [[Recrawl.pendingWithTtl]]'s latest-fetch aggregate.
  */
object LatestView {

  /** One row per `key`: the row with the greatest `ord` (pass a fully-
    * ordering `ord` — e.g. `struct(ts, seq)` — when `ord` alone can tie;
    * ties under a partial order would make the view nondeterministic).
    * Column order of the result matches `df`. */
  def latestByKey(df: DataFrame, key: String, ord: Column): DataFrame = {
    val valueCols = df.columns.filter(_ != key).toSeq
    df.groupBy(col(key))
      .agg(max_by(struct(valueCols.map(col): _*), ord).as("_w"))
      .select(col(key) +: valueCols.map(c => col(s"_w.$c")): _*)
      // restore the caller's column order (groupBy put the key first)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
