package graft.ml

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[PiiScrub]] — the hand-rolled scanners must reproduce java.util.regex
  * leftmost non-overlapping replace semantics EXACTLY (the q45 DuckDB
  * oracle runs the same patterns through RE2; for these dot/dash-separated
  * patterns all three matchers coincide — that claim is what the
  * adversarial property test below checks on the Java side).
  */
class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val IpRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  private val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** Reference: java.util.regex global replace + match count. */
  private def refPass(s: String, pattern: String, repl: String): (String, Int) = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(s)
    val sb = new java.lang.StringBuffer
    var count = 0
    while (m.find()) { count += 1; m.appendReplacement(sb, repl) }
    m.appendTail(sb)
    (sb.toString, count)
  }

  private val targeted = Seq(
    "",
    "plain words only",
    "a@b.com",
    "reach me at first.last+tag@sub.domain-x.example.org today",
    "a@b@c.com",                        // failed attempt must rescan after the '@'
    "a@b.com.x@d.org",                  // two matches sharing a dot-run boundary
    "x a@1.2.3.4 y",                    // numeric domain: NOT an email (no alpha TLD), IS an ip
    "bad@@example..q",                  // empty domain / empty TLD labels
    "trailing-dot@ex.com.",             // match must end before the bare trailing dot
    "a@b.co",                           // 2-char TLD: minimum that matches
    "a@b.c",                            // 1-char TLD: no match
    "u@ex.com123 and v@ex.comabc",      // digits stop the TLD run; 'comabc' extends it
    "-_%+.@x.com @@ @. .@",             // local class punctuation soup
    "1.2.3.4",
    "12345.1.1.1 and 1.2.3.45678",      // >3-digit runs: match must shift or truncate
    "1.2.3.4.5 9.9.9.9.9.9",            // runs of quads: leftmost non-overlapping
    "255.255.255.255 0.0.0.0",
    "1..2.3.4 1.2.3. .1.2.3",           // empty quads: no match
    "555-123-4567",
    "call 555-123-45678 now",           // trailing extra digit stays
    "99-999-9999 9999-999-9999",        // wrong group widths: only embedded suffix forms match
    "555-123-4567-890-1234",            // overlap: second candidate consumed by the first
    "a@b.com 1.2.3.4 555-123-4567 a@b.com")

  test("scanner == java.util.regex on targeted edge cases (all three patterns)") {
    for (s <- targeted) {
      assert(PiiScrub.scrubEmails(s) === refPass(s, EmailRe, "<EMAIL>"), s"emails on: '$s'")
      assert(PiiScrub.scrubIpv4(s) === refPass(s, IpRe, "<IP>"), s"ipv4 on: '$s'")
      assert(PiiScrub.scrubPhones(s) === refPass(s, PhoneRe, "<PHONE>"), s"phones on: '$s'")
    }
  }

  test("scanner == java.util.regex on 4000 adversarial random strings") {
    // alphabet dense in the pattern-relevant characters so matches and
    // near-misses are common, not astronomically rare
    val alphabet = "a1B9.@-_%+ .@.-19 \tz08"
    val rnd = new scala.util.Random(20260817L)
    for (_ <- 0 until 4000) {
      val s = Seq.fill(rnd.nextInt(48))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(PiiScrub.scrubEmails(s) === refPass(s, EmailRe, "<EMAIL>"), s"emails on: '$s'")
      assert(PiiScrub.scrubIpv4(s) === refPass(s, IpRe, "<IP>"), s"ipv4 on: '$s'")
      assert(PiiScrub.scrubPhones(s) === refPass(s, PhoneRe, "<PHONE>"), s"phones on: '$s'")
    }
  }

  test("three-pass composition: counts are per-pass inputs, chained redaction") {
    val s = "mail a@1.2.3.4 or b@ex.com ip 10.0.0.1 tel 555-123-4567"
    val (t1, e) = refPass(s, EmailRe, "<EMAIL>")
    val (t2, i) = refPass(t1, IpRe, "<IP>")
    val (t3, p) = refPass(t2, PhoneRe, "<PHONE>")
    val row = PiiScrub.piiRow(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    assert(row.getInt(0) === e)
    assert(row.getInt(1) === i)
    assert(row.getInt(2) === p)
    assert(row.getUTF8String(3).toString === t3)
    // the numeric-domain address scrubs as partial email? no: a@1.2.3.4 is
    // no email (no alpha TLD) but its quad IS an ip -> 'a@<IP>'
    assert(t3.contains("a@<IP>"))
  }

  test("pii_scrub expression stays inside whole-stage codegen; null in, null out") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold a
    // literal-backed projection into a LocalTableScan with no codegen span
    val df = spark.range(64)
      .select($"id",
        concat(lit("u"), $"id", lit("@ex.com at 10.0.0."), ($"id" % 256).cast("string"))
          .as("text"))
      .select($"id", PiiScrubFunctions.pii_scrub($"text").as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
    val r = df.where($"id" === 7L).select($"p.n_emails", $"p.n_ipv4", $"p.redacted").head()
    assert(r === Row(1, 1, "<EMAIL> at <IP>"))
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(PiiScrubFunctions.pii_scrub($"text")).head()
    assert(nulls.isNullAt(0))
  }
}
