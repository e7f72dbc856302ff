package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextRepetition]] — Gopher-style repetition counts. Oracle = a naive
  * driver-side Scala implementation of the documented semantics (norm,
  * split-preserving-empties, k-gram multiset), independently coded from
  * the spec rather than sharing the kernel's single-pass loop.
  */
class TextRepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(text: String): Seq[Int] = {
    val norm = {
      val t = text.trim.toLowerCase(java.util.Locale.ROOT)
      t.replaceAll("\\s+", " ")
    }
    val tokens = norm.split(" ", -1).toSeq
    def grams(k: Int): Seq[String] =
      if (tokens.length < k) Seq.empty
      else tokens.sliding(k).map(_.mkString(" ")).toSeq
    def stats(k: Int): (Int, Int, Int) = {
      val g = grams(k)
      val counts = g.groupBy(identity).map(_._2.size)
      (g.size, counts.size, if (counts.isEmpty) 0 else counts.max)
    }
    val (n1, d1, t1) = stats(1)
    val (n2, d2, t2) = stats(2)
    val (n3, d3, t3) = stats(3)
    Seq(n1, d1, t1, n2, d2, t2, n3, d3, t3)
  }

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "spam spam spam spam spam",                           // one dominating token
    "buy now buy now buy now buy now",                    // dominating bigram
    "a b c a b c a b c",                                  // dominating trigram
    "",                                                   // empty -> one empty token
    "   ",                                                // whitespace-only
    "single",
    "two tokens",
    "tabs\tand\nnewlines\r\neverywhere here",
    "  leading and trailing  ",
    "MiXeD Case REPEAT mixed case repeat",                // case-folds to dups
    "ünïcödé ünïcödé tëxt tëxt tëxt",
    "the " * 60 + "end") ++
    graft.synth.PageSynth.pages(17L).take(10).map(p => p.page.text)

  test("kernel == naive reference on adversarial + synthetic corpus") {
    val got = cases.toDF("text")
      .select(TextRepetitionFunctions.repetition_stats(col("text")).as("r"))
      .select(col("r.*")).collect()
    got.zip(cases).foreach { case (row, text) =>
      val want = naive(text)
      val g = (0 until 9).map(row.getInt)
      assert(g == want, s"mismatch on '${text.take(50)}': got $g want $want")
    }
  }

  test("null text yields null struct; expression stays in whole-stage codegen") {
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // expression at plan time, so the assertion sees the real codegen plan
    val df = Seq(Option.empty[String], Some("x y x")).toDF("text")
      .repartition(2)
      .select(TextRepetitionFunctions.repetition_stats(col("text")).as("r"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getStruct(0).getInt(0) == 3))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("derived Gopher ratios: duplicate-token and top-gram fractions") {
    // the counts are the ratios' exact numerators/denominators
    val Seq((dupFrac, topFrac)) = Seq("spam spam spam eggs").toDF("text")
      .select(TextRepetitionFunctions.repetition_stats(col("text")).as("r"))
      .select(
        (lit(1.0) - col("r.n_distinct_tokens") / col("r.n_tokens")).as("dup_frac"),
        (col("r.top_token_count") / col("r.n_tokens")).as("top_frac"))
      .as[(Double, Double)].collect().toSeq
    assert(dupFrac == 0.5 && topFrac == 0.75)
  }
}
