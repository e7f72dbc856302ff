package graft.util

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Validates the from-scratch XXH64 against Spark's built-in `xxhash64`
  * column function (same algorithm, same seed 42) — the authoritative
  * oracle available in-sandbox. */
class XxHash64Spec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("matches spark xxhash64 on assorted strings (all length classes)") {
    import spark.implicits._
    val samples = Seq(
      "", "a", "abc", "abcd", "abcdefg", "abcdefgh",
      "https://host0.example.com/page/1",
      "x" * 31, "y" * 32, "z" * 33, "w" * 100,
      "unicode é中文 mix", "DownloadDocumentPDF?DocumentId=42")
    val df = samples.toDF("s")
    val got = df.selectExpr("s", "xxhash64(s) as h").collect()
    got.foreach { row =>
      val s = row.getString(0)
      assert(XxHash64.hashUtf8(s) == row.getLong(1), s"mismatch for '$s'")
    }
  }

  test("property: arbitrary strings match spark xxhash64") {
    import spark.implicits._
    val strs = Gen
      .listOfN(200, Gen.asciiPrintableStr)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(Nil)
      .toVector
    assert(strs.size == 200)
    val rows = strs.toDF("s").selectExpr("s", "xxhash64(s) as h").collect()
    rows.foreach(r => assert(XxHash64.hashUtf8(r.getString(0)) == r.getLong(1)))
  }
}
