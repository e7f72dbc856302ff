package graft.synth

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import graft.model.{Page, RobotsEntry, RobotsRule, Seed}
import graft.util.XxHash64

/** Deterministic synthetic Common-Crawl-style `pages` corpus
  * (FIXTURES.md A1). No wall clock, no `scala.util.Random` sequence state —
  * every field is a pure function of (seed, pageIndex), derived through
  * [[XxHash64.hashLong]] chains, so generation is order-independent and
  * identical across partitionings and JVMs.
  *
  * Properties engineered for the test matrix:
  *  - closed link graph (every href resolves to a generated URL) so
  *    multi-tick crawls are self-contained;
  *  - Zipf-ish host skew with one megahost (`host0`, ~40% of pages) to
  *    exercise salting/AQE skew handling;
  *  - a subset of URLs carries `DownloadDocumentPDF` + `DocumentId=` to
  *    exercise the reference's filter (`scrape-pdfs-from-website/
  *    lambda.ts:65-67`) and key extraction (`:81-83`);
  *  - every page embeds a Textract-style block graph; pages with
  *    `idx % 11 == 0` get edge-case graphs (multi-VALUE ids, duplicate keys,
  *    colons/whitespace in keys, empty values, NOT_SELECTED elements) pinned
  *    to FIXTURES.md A4 cases;
  *  - the `text`/`kv` goldens are computed by the *generator* from its word
  *    lists, independently of the extraction kernel under test.
  */
object PageSynth {

  final val DefaultSeed = 42L
  final val NumHosts = 20

  /** Generation knobs. `Default` reproduces the original fixture corpus
    * byte-for-byte (tests/oracles pin it); bench corpora scale hosts (for
    * window parallelism) and lines (for extraction weight). */
  final case class Config(
      seed: Long = DefaultSeed,
      nHosts: Int = NumHosts,
      megaPct: Int = 40,
      minLines: Int = 2,
      extraLines: Int = 3)

  val Default: Config = Config()

  private val vocab = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private val langs = Array("en", "de", "es", "fr", "zh")

  /** Fully-described synthetic page: the Page row plus generation-time
    * ground truth used by oracles (links in document order, golden KV). */
  final case class SynthPage(
      page: Page,
      links: Vector[String], // absolute URLs in document order
      kv: Vector[(String, String)]) // expected sanitized KV pairs

  @inline private def h(seed: Long, parts: Long*): Long = {
    var acc = XxHash64.hashLong(seed, 0x9747b28cL)
    parts.foreach(p => acc = XxHash64.hashLong(p, acc))
    acc
  }

  @inline private def bounded(x: Long, n: Int): Int =
    (((x % n) + n) % n).toInt

  /** Host index for a page: ~megaPct% megahost `host0`, rest spread. */
  def hostIdx(i: Long, seed: Long = DefaultSeed): Int = hostIdx(i, Config(seed = seed))

  def hostIdx(i: Long, cfg: Config): Int = {
    val r = bounded(h(cfg.seed, 1L, i), 100)
    // nHosts == 1: everything maps to host0 (bounded(_, 0) divided by zero)
    if (r < cfg.megaPct || cfg.nHosts <= 1) 0
    else 1 + bounded(h(cfg.seed, 2L, i), cfg.nHosts - 1)
  }

  def hostName(hIdx: Int): String = s"host$hIdx.example.com"

  /** Page i is a "document" page (URL passes the reference's
    * `DownloadDocumentPDF` filter) iff i % 3 == 0. */
  def isDocumentPage(i: Long): Boolean = i % 3 == 0

  def url(i: Long, seed: Long = DefaultSeed): String = url(i, Config(seed = seed))

  def url(i: Long, cfg: Config): String = {
    val host = hostName(hostIdx(i, cfg))
    if (isDocumentPage(i)) s"https://$host/DownloadDocumentPDF?DocumentId=$i"
    else s"https://$host/page/$i"
  }

  def warcTs(i: Long): Timestamp = new Timestamp(1577836800000L + i * 1000L) // 2020-01-01 + i sec

  def lang(i: Long, seed: Long = DefaultSeed): String = langs(bounded(h(seed, 3L, i), langs.length))

  private def word(x: Long): String = vocab(bounded(x, vocab.length))

  /** Deterministic outlinks of page i over an nPages-closed graph:
    * 3..6 links, document order fixed. Mix of absolute and root-relative
    * hrefs (the latter exercise browser-style resolution), plus one
    * non-matching junk anchor. */
  def linkTargets(i: Long, nPages: Long, seed: Long = DefaultSeed): Vector[Long] =
    linkTargets(i, nPages, Config(seed = seed))

  def linkTargets(i: Long, nPages: Long, cfg: Config): Vector[Long] = {
    val n = 3 + bounded(h(cfg.seed, 4L, i), 4)
    // Long modulus: `nPages.toInt` silently collapsed the link graph to a
    // star for corpora >= 2^31 pages (the design scale this generator
    // exists to exercise); bit-identical to the Int path below 2^31
    // (round-5 review)
    val m = math.max(1L, nPages)
    (0 until n).map(j => ((h(cfg.seed, 5L, i, j.toLong) % m) + m) % m).toVector
  }

  /** Block-graph JSON + goldens for page i. Returns (json, goldenText, kv). */
  def blockGraph(i: Long, seed: Long): (String, String, Vector[(String, String)]) =
    blockGraph(i, Config(seed = seed))

  def blockGraph(i: Long, cfg: Config = Default): (String, String, Vector[(String, String)]) = {
    val seed = cfg.seed
    val sb = new StringBuilder
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]
    var bId = 0
    def nextId(): String = { bId += 1; s"b$bId-$i" }
    def wordBlock(text: String): String = {
      val id = nextId()
      blocks += s"""{"Id":"$id","BlockType":"WORD","Text":"$text"}"""
      id
    }
    def selBlock(selected: Boolean): String = {
      val id = nextId()
      val st = if (selected) "SELECTED" else "NOT_SELECTED"
      blocks += s"""{"Id":"$id","BlockType":"SELECTION_ELEMENT","SelectionStatus":"$st"}"""
      id
    }
    def lineBlock(childIds: Seq[String]): String = {
      val id = nextId()
      val ids = childIds.map("\"" + _ + "\"").mkString(",")
      blocks += s"""{"Id":"$id","BlockType":"LINE","Relationships":[{"Type":"CHILD","Ids":[$ids]}]}"""
      id
    }
    def kvSet(entity: String, childIds: Seq[String], valueIds: Seq[String]): String = {
      val id = nextId()
      val rels = scala.collection.mutable.ArrayBuffer.empty[String]
      if (valueIds.nonEmpty)
        rels += s"""{"Type":"VALUE","Ids":[${valueIds.map("\"" + _ + "\"").mkString(",")}]}"""
      if (childIds.nonEmpty)
        rels += s"""{"Type":"CHILD","Ids":[${childIds.map("\"" + _ + "\"").mkString(",")}]}"""
      val relPart = if (rels.nonEmpty) s""","Relationships":[${rels.mkString(",")}]""" else ""
      blocks += s"""{"Id":"$id","BlockType":"KEY_VALUE_SET","EntityTypes":["$entity"]$relPart}"""
      id
    }

    // --- document text lines ---
    val nLines = cfg.minLines + bounded(h(seed, 6L, i), cfg.extraLines)
    for (li <- 0 until nLines) {
      val nWords = 3 + bounded(h(seed, 7L, i, li.toLong), 5)
      val ws = (0 until nWords).map(wi => word(h(seed, 8L, i, li.toLong, wi.toLong)))
      val ids = ws.map(wordBlock)
      lineBlock(ids)
      ws.foreach(w => sb.append(w).append(' '))
    }
    val goldenText = sb.toString

    // --- KV pairs ---
    val kvGolden = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (i % 11 == 0) {
      // Edge-case graph (FIXTURES.md A4 cases 2-6, 8):
      // (2) key with two VALUE relationships -> last id wins
      val vA = kvSet("VALUE", Seq(wordBlock("loser")), Nil)
      val vB = kvSet("VALUE", Seq(wordBlock("winner")), Nil)
      kvSet("KEY", Seq(wordBlock("Multi"), wordBlock("Value:")), Seq(vA, vB))
      kvGolden.put("multi_value", "winner ")
      // (3) duplicate key text across blocks -> later block wins
      val vC = kvSet("VALUE", Seq(wordBlock("first")), Nil)
      val vD = kvSet("VALUE", Seq(wordBlock("second")), Nil)
      kvSet("KEY", Seq(wordBlock("Dup")), Seq(vC))
      kvSet("KEY", Seq(wordBlock("Dup")), Seq(vD))
      kvGolden.put("dup", "second ")
      // (4) selection elements: SELECTED -> "X ", NOT_SELECTED skipped
      val vE = kvSet("VALUE", Seq(selBlock(true), selBlock(false), wordBlock("done")), Nil)
      kvSet("KEY", Seq(wordBlock("Checks:")), Seq(vE))
      kvGolden.put("checks", "X done ")
      // (5) two colons in key: only first removed; inner whitespace -> _
      val vF = kvSet("VALUE", Seq(wordBlock("v5")), Nil)
      kvSet("KEY", Seq(wordBlock("A:B:"), wordBlock("C")), Seq(vF))
      // key text "A:B: C " -> lower "a:b: c " -> trim "a:b: c" -> "_": "a:b:_c" -> first colon out: "ab:_c"
      kvGolden.put("ab:_c", "v5 ")
      // (6) value trimming to empty -> dropped (selection NOT_SELECTED only)
      val vG = kvSet("VALUE", Seq(selBlock(false)), Nil)
      kvSet("KEY", Seq(wordBlock("Empty")), Seq(vG))
      // (8) key block with VALUE rel to a missing id -> value "" -> dropped
      kvSet("KEY", Seq(wordBlock("Dangling")), Seq(s"missing-$i"))
    } else {
      val nKv = 1 + bounded(h(seed, 9L, i), 3)
      for (ki <- 0 until nKv) {
        val keyWord = word(h(seed, 10L, i, ki.toLong)).capitalize
        val valWords = (0 to bounded(h(seed, 11L, i, ki.toLong), 2))
          .map(vi => word(h(seed, 12L, i, ki.toLong, vi.toLong)))
        val vId = kvSet("VALUE", valWords.map(wordBlock), Nil)
        kvSet("KEY", Seq(wordBlock(s"$keyWord$ki:")), Seq(vId))
        // key text "Alpha0: " -> sanitize -> "alpha0" ; later duplicate wins
        // (Locale.ROOT: the golden must lowercase exactly like
        // JsText.sanitizeKey — a tr/az default locale would desync them)
        kvGolden.put(
          s"${keyWord.toLowerCase(java.util.Locale.ROOT)}$ki", valWords.mkString("", " ", " "))
      }
    }

    (s"""{"Blocks":[${blocks.mkString(",")}]}""", goldenText, kvGolden.toVector)
  }

  /** The full synthetic page, links resolved absolute in document order. */
  def synthPage(i: Long, nPages: Long, seed: Long = DefaultSeed): SynthPage =
    synthPage(i, nPages, Config(seed = seed))

  def synthPage(i: Long, nPages: Long, cfg: Config): SynthPage = {
    val seed = cfg.seed
    val selfUrl = url(i, cfg)
    val targets = linkTargets(i, nPages, cfg)
    val selfOrigin = "https://" + hostName(hostIdx(i, cfg)) // loop-invariant
    val hrefs = targets.zipWithIndex.map { case (t, j) =>
      val abs = url(t, cfg)
      // every third link written root-relative when on the same host
      if (j % 3 == 2 && abs.startsWith(selfOrigin)) abs.substring(selfOrigin.length)
      else abs
    }
    val (blocksJson, goldenText, kv) = blockGraph(i, cfg)
    val html = {
      val b = new StringBuilder
      b.append("<html><head><title>page ").append(i).append("</title></head><body>\n")
      hrefs.zipWithIndex.foreach { case (href, j) =>
        b.append(s"""<p>w$j <a id="l$j" href="$href">link $j</a></p>\n""")
      }
      // junk anchors: no href / mailto / fragment (fragment still resolves)
      b.append("""<a name="anchor-no-href">x</a>""").append('\n')
      b.append(graft.functions.kernels.BlockGraphKernel.PayloadOpen)
        .append(blocksJson)
        .append(graft.functions.kernels.BlockGraphKernel.PayloadClose)
      b.append("\n</body></html>")
      b.toString
    }
    val absLinks = hrefs.map(hr => graft.util.UrlCanonicalizer.resolve(selfUrl, hr))
    SynthPage(
      Page(selfUrl, warcTs(i), html.getBytes(StandardCharsets.UTF_8), goldenText, lang(i, seed)),
      absLinks,
      kv)
  }

  def pages(nPages: Long, seed: Long = DefaultSeed): IndexedSeq[SynthPage] =
    (0L until nPages).map(synthPage(_, nPages, seed))

  def pages(nPages: Long, cfg: Config): IndexedSeq[SynthPage] =
    (0L until nPages).map(synthPage(_, nPages, cfg))

  /** Seed list: first hub page of each of the first k hosts found. */
  def seeds(nPages: Long, k: Int, seed: Long = DefaultSeed): Vector[Seed] =
    seeds(nPages, k, Config(seed = seed))

  def seeds(nPages: Long, k: Int, cfg: Config): Vector[Seed] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[Int, Seed]
    var i = 0L
    while (i < nPages && out.size < k) {
      val hi = hostIdx(i, cfg)
      if (!out.contains(hi))
        out.put(hi, Seed(url(i, cfg), 0, warcTs(0)))
      i += 1
    }
    out.values.toVector
  }

  /** Robots fixtures (FIXTURES.md A3): host1 disallows /page/ (longest-prefix
    * check via an /page/allowed override), host2 disallows everything,
    * megahost host0 allow-all with a crawl delay; other hosts have no entry
    * (allow-all by default). */
  def robots(): Seq[RobotsEntry] = Seq(
    RobotsEntry(hostName(0), Seq(RobotsRule(allow = true, prefix = "/")), crawl_delay = 0.5),
    RobotsEntry(
      hostName(1),
      Seq(
        RobotsRule(allow = false, prefix = "/page/"),
        RobotsRule(allow = true, prefix = "/page/allowed"),
        RobotsRule(allow = true, prefix = "/")),
      crawl_delay = 0.0),
    RobotsEntry(hostName(2), Seq(RobotsRule(allow = false, prefix = "/")), crawl_delay = 0.0))
}
