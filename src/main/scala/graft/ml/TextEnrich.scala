package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.util.XxHash64

/** Fused per-page enrichment kernel: ONE pass over the text computes
  * everything the crawl tick's enrich stage stores — simhash, MinHash
  * band 0, rolling fingerprint, and the quality-feature struct — with one
  * tokenization and zero regexes. The declarative composition it replaces
  * ran ~13 regexp passes per page (punct strip + 10 stopword replaces +
  * whitespace norm) plus four independent tokenizations; profiled at
  * local[8] the enrich stage dominated the tick's commit phase.
  *
  * Bit-parity contract (regression-tested in TextEnrichSpec against the
  * declarative originals):
  *  - `simhash`        == [[TextHashFunctions.simhash64]]
  *  - `minhash_band0`  == `xxhash64(minhash_sig(text, 3, 8))` (Spark's
  *    array fold: h = xxh64(elem, h) from seed 42)
  *  - `fingerprint`    == [[TextHashFunctions.doc_fingerprint]]
  *  - `quality`        == [[TextAnalysis.qualityFeatures]] field by field,
  *    replicating Spark semantics exactly: `length` = codepoints,
  *    `trim` strips 0x20 only, `split(_, " +")` token count, Java-regex
  *    ASCII `\p{Punct}`, and the stopword count's non-overlapping
  *    left-to-right needle consumption over `" " + normText + " "`.
  */
object TextEnrich {

  private val stopwordsEn =
    Array("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Spark's xxhash64 over array<bigint>: fold each element into the
    * running hash, initial seed 42. */
  def sparkXxhash64Array(values: Array[Long]): Long = {
    var h = 42L
    var i = 0
    while (i < values.length) { h = XxHash64.hashLong(values(i), h); i += 1 }
    h
  }

  /** `regexp_replace(lower(trim(text)), "\\s+", " ")` without the regex:
    * strip leading/trailing spaces, lowercase, collapse Java-\s runs to one
    * space (position-preserving: a leading/trailing non-space ws run still
    * yields a space, exactly like regexp_replace). */
  def normText(text: String): String = {
    var s = 0
    var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    // Locale.ROOT: default-locale toLowerCase breaks the bit-parity
    // contract with Spark's locale-independent lower() under e.g. a
    // Turkish JVM locale (I → ı), and made results differ across
    // executors with different locales (round-5 review)
    val lowered = text.substring(s, e).toLowerCase(java.util.Locale.ROOT)
    val n = lowered.length
    val sb = new java.lang.StringBuilder(n)
    var pendingWs = false
    var i = 0
    while (i < n) {
      val c = lowered.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r')
        pendingWs = true
      else {
        if (pendingWs) { sb.append(' '); pendingWs = false }
        sb.append(c)
      }
      i += 1
    }
    if (pendingWs) sb.append(' ')
    sb.toString
  }

  /** `size(split(trim(text), " +"))`: count of maximal non-space runs in
    * the space-trimmed text; 1 for the empty string (split's behavior). */
  def sparkTokenCount(text: String): Int = {
    var s = 0
    var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    if (s == e) 1
    else {
      var count = 0
      var i = s
      while (i < e) {
        while (i < e && text.charAt(i) == ' ') i += 1
        if (i < e) count += 1
        while (i < e && text.charAt(i) != ' ') i += 1
      }
      count
    }
  }

  /** Java-regex ASCII `\p{Punct}` membership. */
  @inline private def isPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') || (c >= '[' && c <= '`') ||
      (c >= '{' && c <= '~')

  /** Non-overlapping left-to-right occurrences of `needle` in `hay`
    * (Spark's regexp_replace length-delta counting trick consumes the
    * needle including its trailing space, so " the the " counts once —
    * replicated here by advancing past each full match). */
  private def countOccurrences(hay: String, needle: String): Int = {
    var count = 0
    var from = 0
    var i = hay.indexOf(needle, from)
    while (i >= 0) {
      count += 1
      from = i + needle.length
      i = hay.indexOf(needle, from)
    }
    count
  }

  val schema: StructType = StructType(Seq(
    StructField("simhash", LongType, nullable = false),
    StructField("minhash_band0", LongType, nullable = false),
    StructField("fingerprint", LongType, nullable = false),
    StructField("quality", StructType(Seq(
      StructField("n_chars", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("mean_token_len", DoubleType, nullable = false),
      StructField("punct_ratio", DoubleType, nullable = false),
      StructField("stopword_ratio", DoubleType, nullable = false))), nullable = false)))

  def enrichRow(t: UTF8String): InternalRow = {
    val text = t.toString

    // one tokenization feeds both hash kernels
    val ts = TextHashKernels.tokens(text)
    val simhash = TextHashKernels.simhashFromTokens(ts)
    val band0 = sparkXxhash64Array(
      TextHashKernels.minhashFromShingles(
        TextHashKernels.shingleHashesFromTokens(ts, 3), 8))
    val fingerprint = TextHashKernels.rollingFingerprint(text)

    // quality features, Spark-declarative semantics without the regexes
    val nChars = t.numChars()
    val nTokens = sparkTokenCount(text)
    var punct = 0
    var i = 0
    while (i < text.length) { if (isPunct(text.charAt(i))) punct += 1; i += 1 }
    val padded = " " + normText(text) + " "
    var stops = 0
    var w = 0
    while (w < stopwordsEn.length) {
      stops += countOccurrences(padded, " " + stopwordsEn(w) + " ")
      w += 1
    }
    val quality = new GenericInternalRow(Array[Any](
      nChars,
      nTokens,
      nChars.toDouble / nTokens,
      punct.toDouble / math.max(nChars, 1),
      stops.toDouble / math.max(nTokens, 1)))

    new GenericInternalRow(Array[Any](simhash, band0, fingerprint, quality))
  }
}

/** `enrich_doc(text)` → struct(simhash, minhash_band0, fingerprint,
  * quality) — see [[TextEnrich]]. */
case class EnrichDoc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextEnrich.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "enrich_doc"
  override protected def nullSafeEval(t: Any): Any =
    TextEnrich.enrichRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.ml.TextEnrich.enrichRow($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextEnrichFunctions {
  def enrich_doc(text: Column): Column = EU.column(EnrichDoc(EU.expression(text)))
}
