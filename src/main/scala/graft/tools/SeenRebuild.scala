package graft.tools

import org.apache.spark.sql.Encoders

import graft.model.FrontierEntry
import graft.seen.SeenSet

/** One-shot seen-set rebuild from the exact frontier — the migration path
  * for lakes whose seen segments use a retired serialization format (the
  * v1→v2 hash-layout fix and the v2→v3 capacity-header fix both hard-fail
  * old blobs at probe time with a pointer here; round-5 advisor: the error
  * suggested a manual rebuild but nothing executable existed).
  *
  * The frontier is the seen set's exact source of truth (every admitted
  * url_hash has exactly one frontier row), so a rebuild is lossless:
  * fresh delta segments from `frontier.url_hash` at the CURRENT build's
  * format replace the `seen` table in one atomic commit. Run it with the
  * same seenPartitions / expectedPerSegment / kind the crawl uses.
  *
  * Usage: runMain graft.tools.SeenRebuild <lakeDir> [P] [expectedPerSegment] [kind]
  */
object SeenRebuild {
  def main(args: Array[String]): Unit = {
    val lakeDir = args(0)
    val p = args.lift(1).map(_.toInt).getOrElse(SeenSet.DefaultPartitions)
    val expectedPerSegment = args.lift(2).map(_.toLong).getOrElse(1L << 16)
    val kind = args.lift(3).getOrElse("bloom")

    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = graft.lake.CrawlLake(lakeDir, spark)
    val frontier = lake.read("frontier", Encoders.product[FrontierEntry].schema)
    val segments = SeenSet.buildDeltaSegments(
      frontier.select("url_hash"), p, expectedPerSegment, kind = kind)
    val batchId = lake.latestSnapshotId.map(id => lake.batchIdOf(id) + 1).getOrElse(0L)
    val snap = lake.commit(batchId, appends = Map.empty, replaces = Map("seen" -> segments.toDF()))
    // re-record the geometry meta so the resume drift guard matches
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(lakeDir, "seen_meta.json"),
      s"""{"p":$p,"kind":"$kind"}""")
    println(s"""{"tool":"seen_rebuild","snapshot":$snap,"p":$p,"kind":"$kind"}""")
    spark.stop()
  }
}
