package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hash-bucketed physical layout for the frontier-sized tables — the
  * 10^10-row shape of the engine's hottest join (SURVEY.md §3 step 1:
  * PENDING = frontier ∖ fetch_log, an anti-join on url_hash every tick).
  *
  * With both sides stored `bucketBy(B, url_hash)`, Catalyst plans the
  * anti-join with NO Exchange on either side (verified in
  * BucketedFrontierSpec via explain): each task reads matching bucket
  * files from both tables and joins locally. At 10^10 frontier rows this
  * removes the only full-table shuffle left in the tick loop; the same
  * layout co-partitions the seen-set confirm join and the extracted/
  * frontier maintenance joins.
  *
  * This module is the drop-in scale layout for [[CrawlLake]]'s append
  * tables (Spark's bucketing needs catalog tables, so it uses
  * `saveAsTable` into the session warehouse rather than raw dirs; a real
  * Iceberg deployment gets the same effect from bucket partition
  * transforms).
  */
object BucketedFrontier {

  val DefaultBuckets = 32

  /** (Re)write a DataFrame as a url_hash-bucketed catalog table. On
    * Overwrite (the default) the table AND any orphan warehouse location
    * are cleared first (the in-memory catalog forgets tables across JVMs
    * while their directories persist); on Append an existing table keeps
    * its rows and only a fresh table's orphan location is cleared —
    * the drop must not run, or `mode` would silently destroy data
    * (round-5 review). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int = DefaultBuckets,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    val overwrite = mode == SaveMode.Overwrite
    if (overwrite) spark.sql(s"DROP TABLE IF EXISTS $table")
    if (overwrite || !spark.catalog.tableExists(table)) {
      val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
      val orphan = java.nio.file.Paths.get(warehouse, table.toLowerCase(java.util.Locale.ROOT))
      if (java.nio.file.Files.exists(orphan)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(orphan).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    df.write
      .mode(mode)
      .bucketBy(buckets, "url_hash")
      .sortBy("url_hash")
      .format("parquet")
      .saveAsTable(table)
  }

  /** The tick's pending set as a bucketed-join: frontier ∖ fetch_log with
    * zero shuffles when both tables share the bucket layout. */
  def pending(spark: SparkSession, frontierTable: String, fetchLogTable: String): DataFrame =
    spark.table(frontierTable).join(
      spark.table(fetchLogTable).select("url_hash"), Seq("url_hash"), "left_anti")

  /** True when the physical plan of `df` contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
