package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{FetchRecord, FrontierEntry}

class StreamingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fe(h: Long, host: String, seq: Long): FrontierEntry =
    FrontierEntry(h, s"https://$host/p$h", host, 1, new Timestamp(60000L), seq, 0L, 1.0)

  test("stateful politeness budget persists across micro-batches") {
    val dir = Files.createTempDirectory("graft-stream-frontier").toString
    val sink = s"politeness_sink_${System.identityHashCode(this)}"

    // batch 1: 5 rows for hostA, 2 for hostB
    spark.createDataset(
      (1L to 5L).map(i => fe(i, "a.com", i)) ++ (6L to 7L).map(i => fe(i, "b.com", i)))
      .write.mode("append").parquet(dir)

    val stream = StreamingOps.frontierDeltaStream(spark, dir).as[FrontierEntry]
    val admissions = StreamingOps.statefulPoliteness(stream, budgetPerHost = 3L)
    val q = admissions.writeStream
      .format("memory").queryName(sink).outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("graft-stream-ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table(sink).where($"admitted").groupBy($"host").count()
        .as[(String, Long)].collect().toMap
      assert(afterB1("a.com") == 3L && afterB1("b.com") == 2L)

      // batch 2: more rows for both hosts — a.com budget already exhausted,
      // b.com has 1 left (state carried across micro-batches)
      spark.createDataset(
        (11L to 13L).map(i => fe(i, "a.com", i)) ++ (14L to 16L).map(i => fe(i, "b.com", i)))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val afterB2 = spark.table(sink).where($"admitted").groupBy($"host").count()
        .as[(String, Long)].collect().toMap
      assert(afterB2("a.com") == 3L, s"budget leaked: $afterB2")
      assert(afterB2("b.com") == 3L, s"state lost: $afterB2")
    } finally q.stop()
  }

  test("windowed fetch-rate aggregation over a fetch_log stream") {
    val dir = Files.createTempDirectory("graft-stream-fetchlog").toString
    val sink = s"rate_sink_${System.identityHashCode(this)}"
    val rows = (1 to 20).map { i =>
      FetchRecord(i.toLong, s"https://h${i % 2}.com/p$i", s"h${i % 2}.com",
        new Timestamp(i * 60000L), if (i % 5 == 0) 404 else 200, 1000L, 0, 1L)
    }
    spark.createDataset(rows).write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Encoders.product[FetchRecord].schema).parquet(dir)
    val q = StreamingOps.fetchRateByHost(stream, "10 minutes").writeStream
      .format("memory").queryName(sink).outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("graft-stream-ckpt2").toString)
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table(sink)
      assert(out.count() > 0)
      val total = out.agg(org.apache.spark.sql.functions.sum($"fetches")).as[Long].head()
      assert(total == 20L)
      val failures = out.agg(org.apache.spark.sql.functions.sum($"failures")).as[Long].head()
      assert(failures == 4L)
    } finally q.stop()
  }
}
