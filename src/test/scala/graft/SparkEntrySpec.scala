package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract insurance: every oracle key has a query, the flagship
  * returns rows, and each registry query runs non-empty at sf0.001 (the
  * driver's smoke/correctness preconditions). */
class SparkEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle keys without queries: $orphans")
  }

  test("flagship entry returns extracted rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registry query runs and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned zero rows")
    }
  }
}
