package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingCurate.DocIn

/** [[StreamingCurate]] — streaming ≡ batch for the stateless enrichment
  * stages, and cross-batch first-arrival-wins exact dedup. */
class StreamingCurateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    DocIn(1L, "the quick brown fox jumps over the lazy dog"),
    DocIn(2L, "der hund und die katze sind mit der maus"),
    DocIn(3L, "THE  quick  brown fox jumps over the lazy dog"), // norm-dup of 1
    DocIn(4L, "completely different content about spark and parquet"),
    DocIn(5L, "el perro y el gato que es por con un"))

  test("stateless enrichment: streaming output ≡ batch output row-for-row") {
    val dir = Files.createTempDirectory("graft-stream-docs").toString
    val sink = s"enrich_sink_${System.identityHashCode(this)}"
    spark.createDataset(docs).write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(Encoders.product[DocIn].schema).parquet(dir)
    val q = StreamingCurate.enrichStream(stream)
      .select($"doc_id", $"quality_ok", $"lang_id", $"model_score", $"fingerprint")
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-stream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(sink).collect()
        .map(r => (r.getLong(0), (r.getBoolean(1), r.getString(2), r.getLong(3), r.getLong(4))))
        .toMap
      val batch = StreamingCurate.enrichStream(spark.createDataset(docs).toDF())
        .select($"doc_id", $"quality_ok", $"lang_id", $"model_score", $"fingerprint")
        .collect()
        .map(r => (r.getLong(0), (r.getBoolean(1), r.getString(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(streamed == batch)
      assert(batch(2L)._2 == "de" && batch(5L)._2 == "es") // the kernels really ran
    } finally q.stop()
  }

  test("streaming exact dedup: first batch wins, later duplicates drop, state persists") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    val sink = s"dedup_sink_${System.identityHashCode(this)}"
    // batch 1: docs 1-5 (3 is a within-batch norm-dup of 1 -> min id 1 kept)
    spark.createDataset(docs).write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(Encoders.product[DocIn].schema).parquet(dir).as[DocIn]
    val q = StreamingCurate.streamingExactDedup(stream)
      .writeStream.format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-stream-ckpt2").toString)
      .start()
    try {
      q.processAllAvailable()
      val after1 = spark.table(sink).select("doc_id").as[Long].collect().toSet
      assert(after1 == Set(1L, 2L, 4L, 5L), s"batch-1 survivors: $after1")
      // the within-batch rule matches batch exactDedup on the same input
      val batchKept = graft.ml.TextDedup.exactDedup(spark.createDataset(docs).toDF())
        .select("doc_id").as[Long].collect().toSet
      assert(after1 == batchKept)

      // batch 2: a cross-batch dup of doc 2, a dup of doc 4, and one new doc
      spark.createDataset(Seq(
        DocIn(10L, "der hund und die katze sind mit der maus"),
        DocIn(11L, "  Completely   DIFFERENT content about spark and parquet "),
        DocIn(12L, "fresh new content never seen before")))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val after2 = spark.table(sink).select("doc_id").as[Long].collect().toSet
      assert(after2 == Set(1L, 2L, 4L, 5L, 12L), s"batch-2 survivors: $after2")
    } finally q.stop()
  }
}
