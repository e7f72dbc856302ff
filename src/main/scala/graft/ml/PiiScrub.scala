package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PII detection + redaction for webtext curation — the scrubbing stage
  * every published training-data recipe runs before release (emails, IP
  * addresses, phone numbers; cf. the redaction steps described for
  * RefinedWeb/Dolma-class corpora). Three sequential non-overlapping
  * leftmost passes, each replacing matches with a typed placeholder:
  *
  *   1. email  `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` → `<EMAIL>`
  *   2. ipv4   `\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}`             → `<IP>`
  *   3. phone  `\d{3}-\d{3}-\d{4}`                              → `<PHONE>`
  *
  * Counts are per-pass match counts over that pass's INPUT (email over the
  * raw text, ipv4 over the email-redacted text, phone over the
  * ipv4-redacted text) — exactly what `len(regexp_extract_all(...))` /
  * `regexp_replace(..., 'g')` chained in the q45 DuckDB oracle computes.
  *
  * The matcher is a hand-rolled single-allocation scanner, NOT
  * `regexp_replace`: (a) one fused pass per pattern instead of six regex
  * expressions per row keeps the whole projection inside one codegen'd
  * static call (the janino-safe [[TextEnrich]] pattern); (b) the scanner
  * reproduces the regex semantics EXACTLY — for all three patterns the
  * quantifier split is forced by the literal separators ('@' / '.' / '-'),
  * so Java-regex leftmost-greedy-with-backtracking and RE2
  * leftmost-longest coincide, and PiiScrubSpec property-checks the scanner
  * against `java.util.regex` on adversarial inputs.
  *
  * 100 TB shape: scan-side codegen'd expression — per-row O(length) time,
  * no shuffle, no driver involvement; composes into the curation pipeline
  * as a pure projection ([[WebTextPipeline.Config.piiRedact]]).
  */
object PiiScrub {

  val schema: StructType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ipv4", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))

  @inline private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  /** email local part: `[A-Za-z0-9._%+-]`. */
  @inline private def isLocal(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '_' || c == '%' || c == '+' || c == '-'
  /** email domain part: `[A-Za-z0-9.-]`. */
  @inline private def isDomain(c: Char): Boolean =
    isAlpha(c) || isDigit(c) || c == '.' || c == '-'

  /** One leftmost non-overlapping email pass. Returns (redacted, count).
    *
    * Matching `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` by hand:
    * a match can only start at the head of a maximal local-class run
    * (later starts inside the run see the same '@' and the same domain and
    * fail identically — Java's start-position scan collapses to this), the
    * domain backtrack tries '.' positions from the rightmost down (the
    * greedy `+` giving back one char at a time only ever re-matches `\.`
    * at actual dots), and `[A-Za-z]{2,}` is a maximal alpha run of length
    * ≥ 2 (greedy, nothing after it). On failure the scan resumes AFTER the
    * '@' — positions before it cannot start a match, positions after it
    * can (`a@b@c.com` must yield `b@c.com`, as java.util.regex does). */
  def scrubEmails(s: String): (String, Int) = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var emitFrom = 0
    var count = 0
    var i = 0
    while (i < n) {
      if (!isLocal(s.charAt(i))) i += 1
      else {
        val runStart = i
        while (i < n && isLocal(s.charAt(i))) i += 1
        if (i < n && s.charAt(i) == '@') {
          val domStart = i + 1
          var j = domStart
          while (j < n && isDomain(s.charAt(j))) j += 1
          // rightmost '.' in the domain run with >=2 alphas after it and
          // >=1 domain char before it
          var matchEnd = -1
          var p = j - 1
          while (matchEnd < 0 && p >= domStart + 1) {
            if (s.charAt(p) == '.') {
              var q = p + 1
              while (q < j && isAlpha(s.charAt(q))) q += 1
              if (q - (p + 1) >= 2) matchEnd = q
            }
            p -= 1
          }
          if (matchEnd >= 0) {
            if (sb == null) sb = new java.lang.StringBuilder(n)
            sb.append(s, emitFrom, runStart).append("<EMAIL>")
            emitFrom = matchEnd
            count += 1
            i = matchEnd
          } else i = domStart
        }
        // else: i is already past the local run
      }
    }
    if (sb == null) (s, 0)
    else (sb.append(s, emitFrom, n).toString, count)
  }

  /** digit-run length at `i`, capped at `cap` (the regex's `\d{1,cap}`
    * greedy take). */
  @inline private def digitRun(s: String, i: Int, cap: Int): Int = {
    val n = s.length
    var k = 0
    while (k < cap && i + k < n && isDigit(s.charAt(i + k))) k += 1
    k
  }

  /** Match end of `\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}` at `i`, or -1.
    * The separator dots force each quantifier (a shorter take leaves the
    * next char a digit, never '.'), so the parse is unique — Java and RE2
    * agree by construction. */
  private def ipMatchEnd(s: String, i: Int): Int = {
    val n = s.length
    var pos = i
    var quad = 0
    while (quad < 3) {
      val d = digitRun(s, pos, 3)
      // a 4th digit after a full take means no '.' can follow any take
      if (d == 0 || pos + d >= n || s.charAt(pos + d) != '.' ||
          (d == 3 && pos + 3 < n && isDigit(s.charAt(pos + 3)))) return -1
      pos += d + 1
      quad += 1
    }
    val d = digitRun(s, pos, 3)
    if (d == 0) -1 else pos + d
  }

  /** Match end of `\d{3}-\d{3}-\d{4}` at `i`, or -1. */
  private def phoneMatchEnd(s: String, i: Int): Int = {
    val n = s.length
    if (i + 12 > n) return -1
    var k = 0
    while (k < 3) { if (!isDigit(s.charAt(i + k))) return -1; k += 1 }
    if (s.charAt(i + 3) != '-') return -1
    k = 4
    while (k < 7) { if (!isDigit(s.charAt(i + k))) return -1; k += 1 }
    if (s.charAt(i + 7) != '-') return -1
    k = 8
    while (k < 12) { if (!isDigit(s.charAt(i + k))) return -1; k += 1 }
    i + 12
  }

  private def scrubBy(s: String, matchEnd: (String, Int) => Int, repl: String): (String, Int) = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var emitFrom = 0
    var count = 0
    var i = 0
    while (i < n) {
      val e = matchEnd(s, i)
      if (e < 0) i += 1
      else {
        if (sb == null) sb = new java.lang.StringBuilder(n)
        sb.append(s, emitFrom, i).append(repl)
        emitFrom = e
        count += 1
        i = e
      }
    }
    if (sb == null) (s, 0)
    else (sb.append(s, emitFrom, n).toString, count)
  }

  def scrubIpv4(s: String): (String, Int) = scrubBy(s, ipMatchEnd, "<IP>")
  def scrubPhones(s: String): (String, Int) = scrubBy(s, phoneMatchEnd, "<PHONE>")

  /** The full three-pass scrub as one codegen-callable row builder. */
  def piiRow(t: UTF8String): GenericInternalRow = {
    val (t1, nEmails) = scrubEmails(t.toString)
    val (t2, nIps) = scrubIpv4(t1)
    val (t3, nPhones) = scrubPhones(t2)
    new GenericInternalRow(Array[Any](
      nEmails, nIps, nPhones, UTF8String.fromString(t3)))
  }
}

/** `pii_scrub(text)` → struct(n_emails, n_ipv4, n_phones, redacted) — see
  * [[PiiScrub]]. */
case class PiiStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiScrub.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pii_scrub"
  override protected def nullSafeEval(t: Any): Any =
    PiiScrub.piiRow(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.ml.PiiScrub.piiRow($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PiiScrubFunctions {
  def pii_scrub(text: Column): Column = EU.column(PiiStats(EU.expression(text)))
}
