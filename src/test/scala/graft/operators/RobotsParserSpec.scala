package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.RobotsRule

class RobotsParserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val body =
    """# example robots.txt
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/ok
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /
      |Sitemap: https://example.com/sitemap.xml
      |""".stripMargin

  test("named group beats * and carries rules + crawl-delay") {
    val e = RobotsParser.parse("example.com", body, "graftbot")
    assert(e.host == "example.com")
    assert(e.rules == Seq(
      RobotsRule(allow = false, "/private/"),
      RobotsRule(allow = true, "/private/ok")))
    assert(e.crawl_delay == 2.5)
    // the parsed entry evaluates with the standard matcher semantics
    assert(!RobotsMatcher.allowed(e.rules, "/private/x"))
    assert(RobotsMatcher.allowed(e.rules, "/private/ok/page"))
    assert(RobotsMatcher.allowed(e.rules, "/public"))
  }

  test("* group applies when no named group matches; unknown agent under full disallow") {
    val e = RobotsParser.parse("example.com", body, "otherbot")
    assert(e.rules == Seq(RobotsRule(allow = false, "/")))
    assert(e.crawl_delay == 0.0)
    assert(!RobotsMatcher.allowed(e.rules, "/anything"))
  }

  test("longest user-agent prefix match wins; same-agent groups merge") {
    val b =
      """User-agent: graft
        |Disallow: /a
        |User-agent: graftbot
        |Disallow: /b
        |User-agent: graftbot
        |Disallow: /c
        |""".stripMargin
    val e = RobotsParser.parse("h", b, "graftbot-news")
    // both "graftbot" groups merge; the shorter "graft" group loses
    assert(e.rules == Seq(RobotsRule(allow = false, "/b"), RobotsRule(allow = false, "/c")))
  }

  test("stacked user-agent lines share one group") {
    val b =
      """User-agent: a
        |User-agent: graftbot
        |Disallow: /x
        |""".stripMargin
    assert(RobotsParser.parse("h", b).rules == Seq(RobotsRule(allow = false, "/x")))
  }

  test("empty Disallow is a no-op; wildcard/anchor patterns pass through verbatim") {
    val b =
      """User-agent: *
        |Disallow:
        |Disallow: /tmp/*/cache
        |Disallow: /exact$
        |Disallow: *
        |Allow: /tmp/
        |""".stripMargin
    val e = RobotsParser.parse("h", b)
    assert(e.rules == Seq(
      RobotsRule(allow = false, "/tmp/*/cache"),
      RobotsRule(allow = false, "/exact$"),
      RobotsRule(allow = false, "*"),
      RobotsRule(allow = true, "/tmp/")))
  }

  test("property: pattern matcher agrees with a regex oracle on random patterns/paths") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // oracle: the REP pattern as an anchored regex — '*' -> '.*', literal
    // segments quoted, trailing '$' -> end anchor, else "matches a prefix"
    def oracle(pattern: String, path: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val pat = if (anchored) pattern.dropRight(1) else pattern
      val body = pat.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
      val rx = ("^" + body + (if (anchored) "$" else ".*") + "$").r
      rx.matches(path)
    }
    val piece = Gen.oneOf("/a", "/bb", "x", ".html", "/", "$", "*", "c")
    val gen = for {
      pn <- Gen.choose(0, 6)
      ps <- Gen.listOfN(pn, piece)
      tn <- Gen.choose(0, 8)
      ts <- Gen.listOfN(tn, Gen.oneOf("/a", "/bb", "x", ".html", "c", "ab"))
    } yield (ps.mkString, ts.mkString)
    val cases = (0 until 3000).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).toList)
    assert(cases.size > 2500)
    cases.foreach { case (pattern, path) =>
      // a '$' anywhere but the end is literal in REP terms; the regex
      // oracle treats it the same way via quoting, so compare verbatim
      assert(RobotsMatcher.matches(pattern, path) == oracle(pattern, path),
        s"pattern '$pattern' vs path '$path'")
    }
  }

  test("REP pattern matching: wildcards, anchors, and specificity") {
    import RobotsMatcher.matches
    assert(matches("/tmp/*/cache", "/tmp/a/b/cache/x"))
    assert(!matches("/tmp/*/cache", "/tmp/cache")) // '*' spans a (possibly empty) run AFTER /tmp/
    assert(matches("/tmp/*/cache", "/tmp//cache"))
    assert(matches("/exact$", "/exact") && !matches("/exact$", "/exactly"))
    assert(matches("*", "/anything") && matches("*.pdf$", "/a/b.pdf"))
    assert(!matches("*.pdf$", "/a/b.pdfx"))
    assert(matches("/a*b*c", "/a-x-b-y-c-z") && !matches("/a*b*c", "/a-x-c"))

    // the round-3 advisor scenario: a wildcard Allow scoped under a
    // Disallow must NOT broaden into overriding it
    val rules = Seq(
      RobotsRule(allow = false, "/private/"),
      RobotsRule(allow = true, "/private/*.html"))
    assert(RobotsMatcher.allowed(rules, "/private/page.html"))   // Allow matches, more specific
    assert(!RobotsMatcher.allowed(rules, "/private/secret.txt")) // Allow does not match
    assert(!RobotsMatcher.allowed(rules, "/private/"))
  }

  test("comments, case-insensitive fields, and unknown directives never close a group") {
    val b =
      """USER-AGENT: GraftBot  # our bot
        |Host: example.com
        |disallow: /a # trailing comment
        |Sitemap: https://x/s.xml
        |DISALLOW: /b
        |Crawl-Delay: nonsense
        |Crawl-Delay: 7
        |""".stripMargin
    val e = RobotsParser.parse("h", b)
    assert(e.rules == Seq(RobotsRule(allow = false, "/a"), RobotsRule(allow = false, "/b")))
    assert(e.crawl_delay == 7.0)
  }

  test("malformed/empty bodies yield the allow-all entry, never throw") {
    assert(RobotsParser.parse("h", null).rules.isEmpty)
    assert(RobotsParser.parse("h", ": : :\n\u0000garbage\nDisallow: /orphan").rules.isEmpty)
  }

  test("parseAll: Spark stage feeds RobotsFilter end-to-end") {
    import spark.implicits._
    val bodies = Seq(
      ("blocked.com", "User-agent: *\nDisallow: /"),
      ("open.com", "User-agent: *\nDisallow:\nCrawl-delay: 1")).toDF("host", "body")
    val dim = RobotsParser.parseAll(bodies)
    val entries = dim.collect().map(e => e.host -> e).toMap
    assert(entries("blocked.com").rules.nonEmpty && entries("open.com").rules.isEmpty)
    assert(entries("open.com").crawl_delay == 1.0)

    val pending = Seq(
      ("blocked.com", "https://blocked.com/x"),
      ("open.com", "https://open.com/y"),
      ("norobots.com", "https://norobots.com/z")).toDF("host", "url")
    val out = RobotsFilter.filterAllowed(pending, dim).select("url").as[String].collect().sorted
    assert(out.toSeq == Seq("https://norobots.com/z", "https://open.com/y"))
  }

  test("fromPages: the robots dimension self-assembles from crawled /robots.txt pages") {
    import spark.implicits._
    def b(s: String): Array[Byte] = s.getBytes("UTF-8")
    val pages = Seq(
      ("https://a.example/robots.txt", b("User-agent: *\nDisallow: /private/\nCrawl-delay: 2")),
      ("https://a.example/page1", b("<html>not robots</html>")),
      // NOT the root robots.txt (RFC 9309 §2.3): content, not policy
      ("https://b.example/sub/robots.txt", b("User-agent: *\nDisallow: /")),
      // named group beats *
      ("https://c.example/robots.txt", b("User-agent: graftbot\nDisallow: /x\nUser-agent: *\nDisallow: /")),
      // one host serving robots under two urls: deterministic min-by-url pick
      ("http://d.example/robots.txt", b("User-agent: *\nDisallow: /http")),
      ("https://d.example/robots.txt", b("User-agent: *\nDisallow: /https"))
    ).toDF("url", "html")

    val entries = RobotsParser.fromPages(pages).collect().map(e => e.host -> e).toMap
    assert(entries.keySet == Set("a.example", "c.example", "d.example"))
    assert(entries("a.example").rules == Seq(RobotsRule(allow = false, "/private/")))
    assert(entries("a.example").crawl_delay == 2.0)
    assert(entries("c.example").rules == Seq(RobotsRule(allow = false, "/x")))
    assert(entries("d.example").rules == Seq(RobotsRule(allow = false, "/http")))

    // end-to-end: the discovered dimension drives the filter; b.example has
    // no (root) robots entry so it stays default-allowed
    val pending = Seq(
      (1L, "a.example", "https://a.example/private/x"),
      (2L, "a.example", "https://a.example/ok"),
      (3L, "b.example", "https://b.example/anything")).toDF("url_hash", "host", "url")
    val allowed = RobotsFilter.filterAllowed(pending, RobotsParser.fromPages(pages))
      .select("url_hash").as[Long].collect().toSet
    assert(allowed == Set(2L, 3L))
  }
}
