package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[HashSample]] — deterministic md5-keyed sampling. */
class HashSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bernoulli keep-rate is round(fraction*65536)/65536 within binomial noise; exact determinism") {
    val n = 20000
    val df = (0 until n).map(_.toLong).toDF("id")
    for (fraction <- Seq(0.1, 0.5)) {
      val kept = df.where(HashSample.bernoulliKeep($"id", fraction)).count()
      val expected = math.round(fraction * 65536.0) / 65536.0
      // 4-sigma binomial band
      val sigma = math.sqrt(n * expected * (1 - expected))
      assert(math.abs(kept - n * expected) < 4 * sigma, s"fraction=$fraction kept=$kept")
      val again = df.where(HashSample.bernoulliKeep($"id", fraction))
        .collect().map(_.getLong(0)).toSet
      val first = df.where(HashSample.bernoulliKeep($"id", fraction))
        .collect().map(_.getLong(0)).toSet
      assert(again === first)
    }
    // different salts draw (nearly) independent samples
    val a = df.where(HashSample.bernoulliKeep($"id", 0.5, salt = "a"))
      .collect().map(_.getLong(0)).toSet
    val b = df.where(HashSample.bernoulliKeep($"id", 0.5, salt = "b"))
      .collect().map(_.getLong(0)).toSet
    assert(a !== b)
    val overlap = (a & b).size.toDouble / n
    assert(overlap > 0.2 && overlap < 0.3, s"overlap=$overlap") // ~0.25 if independent

    assert(df.where(HashSample.bernoulliKeep($"id", 0.0)).count() === 0L)
    assert(df.where(HashSample.bernoulliKeep($"id", 1.0)).count() === n.toLong)
  }

  test("bernoulli predicate is scan-side: no exchange in the plan") {
    val df = (0 until 100).map(_.toLong).toDF("id")
      .where(HashSample.bernoulliKeep($"id", 0.25))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stratifiedTopK: exactly k per stratum, deterministic, independent of partitioning") {
    val df = (0 until 5000).map(i => (i.toLong, s"src${i % 7}")).toDF("id", "src")
    val once = HashSample.stratifiedTopK(df, "src", "id", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).sortBy(x => (x._1, x._3))
    assert(once.groupBy(_._1).forall(_._2.length == 10))
    assert(once.groupBy(_._1).forall { case (_, rows) => rows.map(_._3).toSeq == (1 to 10) })
    val repartitioned = HashSample.stratifiedTopK(df.repartition(13), "src", "id", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).sortBy(x => (x._1, x._3))
    assert(once.toSeq === repartitioned.toSeq)
  }

  test("stratifiedTopK plans a pre-shuffle WindowGroupLimit (megastratum defense)") {
    val df = (0 until 2000).map(i => (i.toLong, s"src${i % 3}")).toDF("id", "src")
    val plan = HashSample.stratifiedTopK(df, "src", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
