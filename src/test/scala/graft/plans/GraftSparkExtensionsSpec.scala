package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{CanonicalizeUrl, CanonicalUrlHash}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions.{col, concat, lit}
import graft.util.UrlCanonicalizer

class GraftSparkExtensionsSpec extends AnyFunSuite {

  // the shared test session already exists, so the rule is injected through
  // the public experimental hook; GraftSparkExtensions itself is exercised
  // against a fresh SparkSessionExtensions below
  private lazy val spark = {
    val s = TestSpark.spark
    if (!s.experimental.extraOptimizations.contains(CollapseCanonicalization))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ CollapseCanonicalization
    s
  }

  test("canonicalization is idempotent (the law the rule relies on)") {
    val urlGen = for {
      scheme <- Gen.oneOf("http", "HTTP", "https")
      host <- Gen.oneOf("Example.com", "a.b.c", "HOST.io:8080", "x.com:80")
      path <- Gen.oneOf("", "/", "/A/b", "/p//q", "/x%20y")
      query <- Gen.oneOf("", "?b=2&a=1", "?flag&z=9&a", "?")
      frag <- Gen.oneOf("", "#f", "#a?b")
    } yield s"$scheme://$host$path$query$frag"
    val urls = Gen.listOfN(300, urlGen).apply(Gen.Parameters.default, Seed(11L)).get
    urls.foreach { u =>
      val once = UrlCanonicalizer.canonicalize(u)
      assert(UrlCanonicalizer.canonicalize(once) == once, s"not idempotent: $u -> $once")
    }
  }

  test("optimizer collapses url_hash64(canonicalize_url(x)) and keeps results equal") {
    import spark.implicits._
    // parquet-backed column: literals would be constant-folded away entirely
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(5).select(concat(lit("HTTP://Example.COM:80/"), col("source"), lit("?b=2&a=1#f")).as("u"))
    val stacked = df.select(url_hash64(canonicalize_url(canonicalize_url($"u"))).as("h"))
    val optimized = stacked.queryExecution.optimizedPlan
    var canonCount = 0
    var hashCount = 0
    optimized.transformAllExpressions {
      case e: CanonicalizeUrl => canonCount += 1; e
      case e: CanonicalUrlHash => hashCount += 1; e
    }
    assert(hashCount == 1)
    assert(canonCount == 0, s"canonicalize_url not collapsed:\n$optimized")
    // semantics preserved
    val direct = df.select(url_hash64($"u").as("h")).as[Long].collect().toSeq
    assert(stacked.as[Long].collect().toSeq == direct)
  }

  test("rule is inert without the pattern") {
    import spark.implicits._
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source").as("u"))
    val plan = df.select(canonicalize_url($"u")).queryExecution.optimizedPlan
    var canonCount = 0
    plan.transformAllExpressions { case e: CanonicalizeUrl => canonCount += 1; e }
    assert(canonCount == 1)
  }

  test("GraftSparkExtensions registers the rule on a SparkSessionExtensions") {
    val exts = new SparkSessionExtensions
    new GraftSparkExtensions().apply(exts) // must not throw; wiring covered above
  }
}
