package graft.lake

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{FetchRecord, FrontierEntry}

class BucketedFrontierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fe(h: Long) = FrontierEntry(h, s"https://h${h % 7}.com/p$h", s"h${h % 7}.com",
    1, new Timestamp(0L), h, 0L, 1.0)
  private def fr(h: Long) = FetchRecord(h, s"https://h${h % 7}.com/p$h", s"h${h % 7}.com",
    new Timestamp(60000L), 200, 100L, 0, 1L)

  private def withNoBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed frontier \\ fetch_log anti-join plans with zero shuffles") {
    val frontier = spark.createDataset((0L until 5000L).map(fe)).toDF()
    val fetched = spark.createDataset((0L until 2000L).map(fr)).toDF()
    BucketedFrontier.writeBucketed(frontier, "bf_frontier", buckets = 8)
    BucketedFrontier.writeBucketed(fetched, "bf_fetchlog", buckets = 8)

    withNoBroadcast {
      val pending = BucketedFrontier.pending(spark, "bf_frontier", "bf_fetchlog")
      assert(BucketedFrontier.isShuffleFree(pending),
        pending.queryExecution.executedPlan.toString)
      assert(pending.count() == 3000L)
    }

    // the same join over plain (unbucketed) parquet DOES shuffle — the
    // layout, not the query, is what removes the exchange
    val dir = java.nio.file.Files.createTempDirectory("bf-plain").toString
    frontier.write.parquet(s"$dir/f")
    fetched.write.parquet(s"$dir/l")
    withNoBroadcast {
      val plain = spark.read.parquet(s"$dir/f").join(
        spark.read.parquet(s"$dir/l").select("url_hash"), Seq("url_hash"), "left_anti")
      assert(!BucketedFrontier.isShuffleFree(plain),
        plain.queryExecution.executedPlan.toString)
    }
  }

  test("writeBucketed honors SaveMode.Append: existing rows survive") {
    // round-5 review: the unconditional DROP TABLE + dir delete made the
    // mode parameter a lie — Append silently destroyed all prior rows
    val a = spark.createDataset((0L until 100L).map(fe)).toDF()
    val b = spark.createDataset((100L until 150L).map(fe)).toDF()
    BucketedFrontier.writeBucketed(a, "bf_append_t", buckets = 4)
    BucketedFrontier.writeBucketed(b, "bf_append_t", buckets = 4,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(spark.table("bf_append_t").count() == 150L)
    // and Overwrite still replaces
    BucketedFrontier.writeBucketed(b, "bf_append_t", buckets = 4)
    assert(spark.table("bf_append_t").count() == 50L)
  }

  test("bucketed seen-confirm join is also shuffle-free on the probe side") {
    val candidates = spark.createDataset((4500L until 5500L).map(fe)).toDF()
    BucketedFrontier.writeBucketed(candidates, "bf_candidates", buckets = 8)
    withNoBroadcast {
      val confirm = spark.table("bf_candidates").join(
        spark.table("bf_frontier").select("url_hash"), Seq("url_hash"), "left_anti")
      assert(BucketedFrontier.isShuffleFree(confirm),
        confirm.queryExecution.executedPlan.toString)
      assert(confirm.count() == 500L) // frontier holds 0..4999, so 5000..5499 are new
    }
  }
}
