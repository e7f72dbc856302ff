package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[QualityModel]] — hashed-linear quality scorer. Oracle = a naive
  * driver-side implementation of the documented semantics (norm, split
  * preserving empties, md5-derived weight per token), coded independently
  * of the kernel's loop; plus an in-engine declarative parity form built
  * from Spark's own md5/conv built-ins.
  */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naiveWeight(seed: String, token: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest((seed + "|" + token).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    Integer.parseInt(h.substring(0, 4), 16) - 32768
  }

  private def naive(seed: String, text: String): (Int, Long) = {
    val norm = text.trim.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    val tokens = norm.split(" ", -1)
    (tokens.length, tokens.map(t => naiveWeight(seed, t).toLong).sum)
  }

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "",
    "   ",
    "single",
    "UPPER lower MiXeD",
    "tabs\tand\nnewlines\r\nhere",
    "ünïcödé tökens ünïcödé",
    "punctuation, everywhere! (lots) of-it;",
    "1 22 333 4444 55555",
    "the " * 50 + "end") ++
    graft.synth.PageSynth.pages(23L).take(10).map(_.page.text)

  test("kernel == naive reference on adversarial + synthetic corpus") {
    val got = cases.toDF("text")
      .select(QualityModelFunctions.quality_score(col("text"), "spec-seed").as("q"))
      .select(col("q.n_tokens"), col("q.score"))
      .collect()
    got.zip(cases).foreach { case (row, text) =>
      val (nt, sc) = naive("spec-seed", text)
      assert(row.getInt(0) == nt, s"n_tokens mismatch on '${text.take(40)}'")
      assert(row.getLong(1) == sc, s"score mismatch on '${text.take(40)}'")
    }
  }

  test("kernel == declarative md5/conv parity form (the q50 oracle shape)") {
    // the same arithmetic spelled in Spark built-ins — the in-engine twin
    // of the DuckDB oracle SQL
    val toks = split(TextDedup.normText(col("text")), " ", -1)
    val declarative = aggregate(
      transform(toks, t =>
        (conv(substring(md5(concat(lit("spec-seed|"), t)), 1, 4), 16, 10).cast("long") - 32768L)),
      lit(0L), (acc, x) => acc + x)
    val rows = cases.toDF("text")
      .select(
        QualityModelFunctions.quality_score(col("text"), "spec-seed").getField("score").as("kernel"),
        declarative.as("decl"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("different seeds draw independent weight tables") {
    val r = Seq("some fixed text to score").toDF("text")
      .select(
        QualityModelFunctions.quality_score(col("text"), "seed-a").getField("score").as("a"),
        QualityModelFunctions.quality_score(col("text"), "seed-b").getField("score").as("b"))
      .head()
    assert(r.getLong(0) != r.getLong(1))
  }

  test("score distribution is roughly centered (zero-mean weights)") {
    // 400 distinct one-token docs: mean weight must sit well inside
    // +-3 sigma of 0 (sigma = 65536/sqrt(12)/sqrt(400) ~ 946)
    val scores = (0 until 400).map(i => s"tok$i").toDF("text")
      .select(QualityModelFunctions.quality_score(col("text"), "dist").getField("score"))
      .collect().map(_.getLong(0))
    val mean = scores.sum.toDouble / scores.length
    assert(math.abs(mean) < 3 * 65536.0 / math.sqrt(12.0) / math.sqrt(400.0), s"mean $mean")
  }

  test("null text yields null struct; expression stays in whole-stage codegen") {
    val df = Seq(Option.empty[String], Some("x y z")).toDF("text")
      .repartition(2)
      .select(QualityModelFunctions.quality_score(col("text"), "s").as("q"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) && r.getStruct(0).getInt(0) == 3))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("seed is restricted to code-safe characters") {
    intercept[IllegalArgumentException] {
      QualityModelFunctions.quality_score(col("text"), "bad\"seed")
    }
  }
}
