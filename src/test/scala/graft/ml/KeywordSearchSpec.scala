package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[KeywordSearch]] — inverted index + exact-integer relevance. Oracle =
  * a naive driver-side implementation of the documented semantics. */
class KeywordSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark window scan spark spark"),
    (2L, "window scan merge sort"),
    (3L, "completely unrelated words here"),
    (4L, "spark scan"),
    (5L, "SPARK  Window "), // normalizes; dup terms across case/space
    (6L, "scan scan scan scan"))

  private def naive(queries: Seq[(String, String)], k: Int): Set[(String, Long, Long, Int)] = {
    def toks(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1).toSeq
    val n = corpus.size.toLong
    val postings = corpus.flatMap { case (id, t) => toks(t).map(w => (w, id)) }
      .groupBy(identity).map { case ((w, id), xs) => (w, id, xs.size.toLong) }.toSeq
    val dfm = postings.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size.toLong }
    queries.flatMap { case (qid, qt) =>
      val terms = toks(qt).distinct
      val scores = postings.filter(p => terms.contains(p._1))
        .groupBy(_._2)
        .map { case (id, xs) =>
          id -> xs.map(p => p._3 * (KeywordSearch.Scale * n / dfm(p._1))).sum
        }.toSeq
      scores.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1) }
    }.toSet
  }

  test("searchTopK == naive reference (scores, ranks, tiebreaks)") {
    val queries = Seq(("qa", "spark window"), ("qb", "scan"), ("qc", "missing spark"))
    val got = KeywordSearch.searchTopK(corpus.toDF("doc_id", "text"), queries, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == naive(queries, 3))
  }

  test("result is invariant to input partitioning") {
    val queries = Seq(("q", "spark scan window"))
    def run(parts: Int) =
      KeywordSearch.searchTopK(corpus.toDF("doc_id", "text").repartition(parts), queries, k = 6)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(run(1) == run(7))
  }

  test("absent query terms contribute nothing; all-absent query returns no rows") {
    val got = KeywordSearch.searchTopK(
      corpus.toDF("doc_id", "text"), Seq(("qz", "zzz qqq")), k = 5).count()
    assert(got == 0L)
  }

  test("top-k window plans a pre-shuffle WindowGroupLimit (megaquery defense)") {
    val plan = KeywordSearch.searchTopK(
      corpus.toDF("doc_id", "text"), Seq(("q", "spark")), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("guards") {
    intercept[IllegalArgumentException](
      KeywordSearch.searchTopK(corpus.toDF("doc_id", "text"), Seq(("q", "x")), k = 0))
    intercept[IllegalArgumentException](
      KeywordSearch.searchTopK(corpus.toDF("doc_id", "text"), Seq.empty, k = 1))
  }
}
