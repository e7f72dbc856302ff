package graft.ml

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bit-parity of the fused [[EnrichDoc]] kernel against the declarative
  * composition it replaced in the crawl tick's enrich stage. */
class TextEnrichSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "The the THE of and to in is it for on",            // adjacent stopwords
    " leading and trailing spaces  ",
    "tabs\tand\nnewlinesmixed\r\nwhitespace",
    "punct!!! lots... of, punct;;; (and) [brackets] {braces} <angle>",
    "",                                                  // empty
    "   ",                                               // spaces only
    "single",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z", // many short tokens
    "no stopwords here whatsoever truly none",
    "ünïcödé tëxt with Ümlauts and ÉMOJI-free content",
    "the " * 50 + "end") ++
    graft.synth.PageSynth.pages(40L).map(p =>
      new String(p.page.html, java.nio.charset.StandardCharsets.UTF_8).take(2000))

  test("fused enrich_doc == declarative simhash/band0/fingerprint/quality, field by field") {
    val df = cases.toDF("text")
    val declarative = df.select(
      TextHashFunctions.simhash64(col("text")).as("simhash"),
      xxhash64(TextHashFunctions.minhash_sig(col("text"), numHashes = 8)).as("minhash_band0"),
      TextHashFunctions.doc_fingerprint(col("text")).as("fingerprint"),
      TextAnalysis.qualityFeatures(col("text")).as("quality"))
    val fused = df.select(TextEnrichFunctions.enrich_doc(col("text")).as("e"))
      .select(col("e.simhash"), col("e.minhash_band0"), col("e.fingerprint"), col("e.quality"))

    val d = declarative.collect()
    val f = fused.collect()
    assert(d.length == f.length)
    d.zip(f).zip(cases).foreach { case ((dr, fr), text) =>
      assert(dr.getLong(0) == fr.getLong(0), s"simhash mismatch on: ${text.take(60)}")
      assert(dr.getLong(1) == fr.getLong(1), s"band0 mismatch on: ${text.take(60)}")
      assert(dr.getLong(2) == fr.getLong(2), s"fingerprint mismatch on: ${text.take(60)}")
      val dq = dr.getStruct(3)
      val fq = fr.getStruct(3)
      assert(dq.getInt(0) == fq.getInt(0), s"n_chars mismatch on: ${text.take(60)}")
      assert(dq.getInt(1) == fq.getInt(1), s"n_tokens mismatch on: ${text.take(60)}")
      assert(dq.getDouble(2) == fq.getDouble(2), s"mean_token_len mismatch on: ${text.take(60)}")
      assert(dq.getDouble(3) == fq.getDouble(3), s"punct_ratio mismatch on: ${text.take(60)}")
      assert(dq.getDouble(4) == fq.getDouble(4), s"stopword_ratio mismatch on: ${text.take(60)}")
    }
  }

  test("enrich_doc is null-safe and codegen-compatible") {
    val df = Seq(Some("some text"), None).toDF("text")
    val out = df.select(TextEnrichFunctions.enrich_doc(col("text")).as("e")).collect()
    assert(out(0).getStruct(0) != null)
    assert(out(1).isNullAt(0))
  }
}
