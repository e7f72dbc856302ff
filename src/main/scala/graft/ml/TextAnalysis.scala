package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline: token counting,
  * quality scoring, n-gram-heuristic language ID, fingerprints. All
  * declarative (built-in, codegen'd expressions) except the rolling-hash
  * fingerprint which is a custom expression ([[DocFingerprint]]) — so every
  * scan stays column-pruned and inside whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace-token count (single-space-normalized split). */
  def tokenCount(textCol: Column): Column =
    size(split(trim(textCol), " +"))

  /** A BPE-ish subword count upper bound: word tokens plus intra-word
    * punctuation/digit boundaries (regex split on letter/digit/punct class
    * changes) — the cheap token-budget estimator a data pipeline uses
    * before running a real tokenizer. */
  def subwordCountEstimate(textCol: Column): Column =
    size(split(trim(textCol), "(?<=[a-zA-Z])(?=[0-9])|(?<=[0-9])(?=[a-zA-Z])|[^a-zA-Z0-9]+"))

  private val stopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
  private val stopwordsDe = Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf")
  private val stopwordsEs = Seq("el", "la", "de", "y", "que", "en", "un", "es", "por", "con")
  private val stopwordsFr = Seq("le", "la", "de", "et", "que", "en", "un", "est", "pour", "dans")

  /** Count of occurrences of any of `words` as single-space-delimited
    * tokens (over " "+norm+" " so edges count). */
  private def stopwordHits(textCol: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), TextDedup.normText(textCol), lit(" "))
    words.map { w =>
      val needle = s" $w "
      // non-overlapping occurrence count via length delta
      ((length(padded) - length(regexp_replace(padded, needle, " "))) /
        (needle.length - 1)).cast("long")
    }.reduce(_ + _)
  }

  /** Quality-score struct: the length/punct/stopword features a webtext
    * filter thresholds on (C4/Gopher-style heuristics, declaratively). */
  def qualityFeatures(textCol: Column): Column = {
    val len = length(textCol)
    val nTokens = tokenCount(textCol)
    val punct = length(regexp_replace(textCol, "[^\\p{Punct}]", ""))
    val stops = stopwordHits(textCol, stopwordsEn)
    struct(
      len.as("n_chars"),
      nTokens.as("n_tokens"),
      (len.cast("double") / nTokens).as("mean_token_len"),
      (punct.cast("double") / greatest(len, lit(1))).as("punct_ratio"),
      (stops.cast("double") / greatest(nTokens, lit(1))).as("stopword_ratio"))
  }

  /** Pass/fail quality gate with the standard thresholds. */
  def qualityOk(textCol: Column): Column = {
    val f = qualityFeatures(textCol)
    (f("n_tokens") >= 5) && (f("mean_token_len") >= 2.0) && (f("mean_token_len") <= 12.0) &&
      (f("punct_ratio") <= 0.3)
  }

  /** Stopword-list language ID over {en,de,es,fr}; "und" (undetermined)
    * when no list scores. Deterministic tie-break by list order. */
  def langId(textCol: Column): Column = {
    val scores = Seq(
      "en" -> stopwordHits(textCol, stopwordsEn),
      "de" -> stopwordHits(textCol, stopwordsDe),
      "es" -> stopwordHits(textCol, stopwordsEs),
      "fr" -> stopwordHits(textCol, stopwordsFr))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Normalized md5 fingerprint (SQL-expressible twin of the rolling-hash
    * [[TextHashFunctions.doc_fingerprint]]). */
  def md5Fingerprint(textCol: Column): Column = md5(TextDedup.normText(textCol))

  /** One-stop enrichment used by `SparkEntry.entry` and the docs demo. */
  def enrich(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("features", qualityFeatures(col(textCol)))
      .withColumn("quality_ok", qualityOk(col(textCol)))
      .withColumn("lang_id", langId(col(textCol)))
      .withColumn("fingerprint", TextHashFunctions.doc_fingerprint(col(textCol)))
}
