package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Decontaminate]] — benchmark n-gram decontamination vs a naive
  * driver-side reference of the documented semantics. */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def grams(text: String, n: Int): Seq[String] = {
    val norm = text.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    val toks = norm.split(" ", -1).toSeq
    if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def naive(
      docs: Seq[(Long, String)], bench: Seq[String], n: Int): Map[Long, Long] = {
    val benchSet = bench.flatMap(grams(_, n)).toSet
    docs.map { case (id, t) => id -> grams(t, n).count(benchSet.contains).toLong }.toMap
  }

  test("planted overlaps flag; clean docs report zero; counts match the naive reference") {
    val benchTexts = Seq(
      "the capital of france is paris and its river is the seine",
      "two plus two equals four in every base above four")
    val docs = Seq(
      (1L, "utterly unrelated content about spark physical plans and shuffles here"),
      // embeds a full 8-gram from bench doc 0
      (2L, "trivia says the capital of france is paris and its river flows north"),
      // embeds bench doc 1 wholesale -> many hits
      (3L, "fact: two plus two equals four in every base above four indeed"),
      (4L, "short doc"),
      // 7-token shared span only: NOT a width-8 hit
      (5L, "the capital of france is paris and money elsewhere entirely"))
    val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Decontaminate.contaminationCounts(docs.toDF("doc_id", "text"), bench)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val want = naive(docs, benchTexts, 8)
    assert(got.view.mapValues(_._1).toMap === want)
    assert(got(1L) === ((0L, 0)))
    assert(got(2L)._2 === 1)
    assert(got(3L)._1 > 1L)
    assert(got(5L) === ((0L, 0)))
    // clean() drops exactly the contaminated ids
    val kept = Decontaminate.clean(docs.toDF("doc_id", "text"), bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L))
  }

  test("empty benchmark set: nothing flagged, all docs report 0") {
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "j k l m n o p q r")).toDF("doc_id", "text")
    val bench = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val got = Decontaminate.contaminationCounts(docs, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 0L, 0), (2L, 0L, 0)))
  }

  test("random corpora match the naive reference across gram widths") {
    val rnd = new scala.util.Random(99L)
    val vocab = Vector("a", "b", "c", "d", "e")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (n <- Seq(2, 3, 5)) {
      val docs = (0L until 50L).map(i => (i, doc(3 + rnd.nextInt(20))))
      val benchTexts = Seq.fill(5)(doc(10))
      val bench = benchTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Decontaminate.contaminationCounts(docs.toDF("doc_id", "text"), bench, n = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === naive(docs, benchTexts, n), s"n=$n")
    }
  }

  test("token_ngrams stays inside whole-stage codegen; sub-n docs yield empty arrays") {
    val df = spark.range(32)
      .select($"id", concat(lit("w"), $"id", lit(" x y z a b c d e f")).as("text"))
      .select($"id", TextRepetitionFunctions.token_ngrams($"text", 8).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
    assert(df.select(size($"g")).as[Int].head() === 3)
    val short = Seq("a b c").toDF("text")
      .select(TextRepetitionFunctions.token_ngrams($"text", 8).as("g"))
    assert(short.select(size($"g")).as[Int].head() === 0)
  }
}
