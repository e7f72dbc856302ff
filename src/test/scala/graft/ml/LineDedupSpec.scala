package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[LineDedup]] — corpus-level duplicated-line removal vs a naive
  * driver-side reference implementation of the documented semantics. */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(docs: Seq[(Long, String)], maxOcc: Long): Map[Long, String] = {
    val counts = docs
      .flatMap { case (_, t) => t.split("\n", -1) }
      .groupBy(identity).map { case (l, o) => (l, o.size.toLong) }
    docs.flatMap { case (id, t) =>
      val kept = t.split("\n", -1).filter(l => counts(l) <= maxOcc)
      if (kept.isEmpty) None else Some(id -> kept.mkString("\n"))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], maxOcc: Long): Map[Long, String] =
    LineDedup.dropFrequentLines(docs.toDF("doc_id", "text"), maxOcc)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("shared boilerplate lines vanish from every doc; unique content survives in order") {
    val docs = (0L until 40L).map { i =>
      (i, s"headline $i\ncookie banner accept all\nbody $i line one\nbody $i line two\n(c) example corp")
    }
    val got = run(docs, maxOcc = 5)
    assert(got === naive(docs, 5))
    assert(got(7L) === "headline 7\nbody 7 line one\nbody 7 line two")
  }

  test("docs whose every line is over-threshold are dropped entirely") {
    val docs = (0L until 10L).map(i => (i, "same\nsame again")) :+ (99L, "unique doc")
    val got = run(docs, maxOcc = 3)
    assert(got === Map(99L -> "unique doc"))
  }

  test("threshold boundary: exactly maxOcc occurrences are kept, maxOcc+1 dropped") {
    val docs =
      (0L until 4L).map(i => (i, s"kept-at-four\nmine $i")) ++
        (10L until 15L).map(i => (i, s"dropped-at-five\nmine $i"))
    val got = run(docs, maxOcc = 4)
    assert(got === naive(docs, 4))
    assert(got(0L) === "kept-at-four\nmine 0")
    assert(got(10L) === "mine 10")
  }

  test("trailing empty lines count as lines (split -1 semantics)") {
    // '' occurs 6x -> dropped at maxOcc=5; the doc with ONLY empties vanishes
    val docs = (0L until 5L).map(i => (i, s"text $i\n")) :+ (50L, "\n")
    val got = run(docs, maxOcc = 5)
    assert(got === naive(docs, 5))
    assert(got(0L) === "text 0")
    assert(!got.contains(50L))
  }

  test("random corpora match the naive reference") {
    val rnd = new scala.util.Random(42)
    val sharedPool = Vector("footer", "nav", "ads here", "", "subscribe now")
    for (_ <- 0 until 5) {
      val docs = (0L until 60L).map { i =>
        val nLines = 1 + rnd.nextInt(6)
        val lines = Seq.fill(nLines) {
          if (rnd.nextBoolean()) sharedPool(rnd.nextInt(sharedPool.size))
          else s"u${rnd.nextInt(100000)}"
        }
        (i, lines.mkString("\n"))
      }
      val maxOcc = 1 + rnd.nextInt(20)
      assert(run(docs, maxOcc) === naive(docs, maxOcc), s"maxOcc=$maxOcc")
    }
  }
}
