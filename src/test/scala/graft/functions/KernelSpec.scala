package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.kernels.{BlockGraphKernel, LinkKernel}

class LinkKernelSpec extends AnyFunSuite {

  test("hrefs extracted in document order, quote styles, case") {
    val html =
      """<html><body>
        |<A HREF="https://a.com/1">one</A>
        |<a id="x" href='https://a.com/2'>two</a>
        |<a href=https://a.com/3>three</a>
        |<a name="no-href">skip</a>
        |<a
        |  href="https://a.com/4">four</a>
        |</body></html>""".stripMargin
    assert(LinkKernel.extractHrefs(html).toSeq ==
      Seq("https://a.com/1", "https://a.com/2", "https://a.com/3", "https://a.com/4"))
  }

  test("anchors inside comments and scripts are skipped") {
    val html =
      """<body><!-- <a href="https://no.com/c">x</a> -->
        |<script>var s = '<a href="https://no.com/s">x</a>';</script>
        |<a href="https://yes.com/">y</a></body>""".stripMargin
    assert(LinkKernel.extractHrefs(html).toSeq == Seq("https://yes.com/"))
  }

  test("extractLinks resolves relative hrefs against the page url (a.href semantics)") {
    val html = """<a href="/abs">a</a><a href="rel.html">b</a><a href="https://x.com/full">c</a>"""
    val out = LinkKernel.extractLinks(html.getBytes("UTF-8"), "https://h.com/dir/index.html")
    assert(out.toSeq == Seq("https://h.com/abs", "https://h.com/dir/rel.html", "https://x.com/full"))
  }

  test("null html yields no links") {
    assert(LinkKernel.extractLinks(null, "https://h.com/").isEmpty)
  }

  test("'>' inside a quoted attribute value does not truncate the tag (HTML5 quoted state)") {
    // round-5 review: indexOf('>') landed inside the quoted href and the
    // crawl admitted a mangled URL; the browser reference keeps the value
    val html =
      """<a href="/p?q=a>b">x</a>
        |<a title="y>z" href='/gt'>g</a>
        |<a href=/plain>p</a>""".stripMargin
    assert(LinkKernel.extractHrefs(html).toSeq == Seq("/p?q=a>b", "/gt", "/plain"))
  }

  test("stray apostrophe in an unquoted attribute value does not open a quote") {
    // quotes only open in attribute-value position (after '='); a naive
    // toggle would scan past the real '>' hunting a closing quote
    val html = """<a data-t=don't href="/ok">x</a><a href="/next">y</a>"""
    assert(LinkKernel.extractHrefs(html).toSeq == Seq("/ok", "/next"))
  }
}

/** FIXTURES.md A4 golden cases, each pinned to reference behavior
  * (`send-textract-result-to-dynamo/lambda.ts`). */
class BlockGraphKernelSpec extends AnyFunSuite {

  private def doc(blocks: String*): String = s"""{"Blocks":[${blocks.mkString(",")}]}"""
  private def word(id: String, t: String) =
    s"""{"Id":"$id","BlockType":"WORD","Text":"$t"}"""
  private def sel(id: String, status: String) =
    s"""{"Id":"$id","BlockType":"SELECTION_ELEMENT","SelectionStatus":"$status"}"""
  private def kv(id: String, et: String, valueIds: Seq[String], childIds: Seq[String]) = {
    val rels = Seq(
      if (valueIds.nonEmpty) Some(s"""{"Type":"VALUE","Ids":[${valueIds.map("\"" + _ + "\"").mkString(",")}]}""") else None,
      if (childIds.nonEmpty) Some(s"""{"Type":"CHILD","Ids":[${childIds.map("\"" + _ + "\"").mkString(",")}]}""") else None
    ).flatten.mkString(",")
    s"""{"Id":"$id","BlockType":"KEY_VALUE_SET","EntityTypes":["$et"],"Relationships":[$rels]}"""
  }
  private def line(id: String, childIds: Seq[String]) =
    s"""{"Id":"$id","BlockType":"LINE","Relationships":[{"Type":"CHILD","Ids":[${childIds.map("\"" + _ + "\"").mkString(",")}]}]}"""

  test("case 1: plain KV pair (lambda.ts:74-89)") {
    val j = doc(
      word("w1", "Name:"), word("w2", "Alice"),
      kv("v1", "VALUE", Nil, Seq("w2")),
      kv("k1", "KEY", Seq("v1"), Seq("w1")))
    val r = BlockGraphKernel.extractFromJson(j)
    assert(r.data == Seq("name" -> "Alice "))
  }

  test("case 2: multiple VALUE ids - last id wins (lambda.ts:11-21)") {
    val j = doc(
      word("w1", "K"), word("wa", "loser"), word("wb", "winner"),
      kv("va", "VALUE", Nil, Seq("wa")),
      kv("vb", "VALUE", Nil, Seq("wb")),
      kv("k1", "KEY", Seq("va", "vb"), Seq("w1")))
    assert(BlockGraphKernel.extractFromJson(j).data == Seq("k" -> "winner "))
  }

  test("case 3: duplicate key text - later block wins (lambda.ts:85)") {
    val j = doc(
      word("w1", "Dup"), word("w2", "Dup"), word("wa", "first"), word("wb", "second"),
      kv("va", "VALUE", Nil, Seq("wa")),
      kv("vb", "VALUE", Nil, Seq("wb")),
      kv("k1", "KEY", Seq("va"), Seq("w1")),
      kv("k2", "KEY", Seq("vb"), Seq("w2")))
    assert(BlockGraphKernel.extractFromJson(j).data == Seq("dup" -> "second "))
  }

  test("case 4: WORD + selection elements, trailing space (lambda.ts:25-47)") {
    val j = doc(
      word("w1", "Boxes"),
      sel("s1", "SELECTED"), sel("s2", "NOT_SELECTED"), word("w2", "end"),
      kv("v1", "VALUE", Nil, Seq("s1", "s2", "w2")),
      kv("k1", "KEY", Seq("v1"), Seq("w1")))
    val r = BlockGraphKernel.extractFromJson(j)
    assert(r.data == Seq("boxes" -> "X end "))
  }

  test("case 5: sanitization - case/ws/two colons, first removed (lambda.ts:184-191)") {
    val j = doc(
      word("w1", "A:B:"), word("w2", "C"), word("wv", "v"),
      kv("v1", "VALUE", Nil, Seq("wv")),
      kv("k1", "KEY", Seq("v1"), Seq("w1", "w2")))
    assert(BlockGraphKernel.extractFromJson(j).data == Seq("ab:_c" -> "v "))
  }

  test("case 6: value trimming to empty dropped; kept value stays untrimmed (lambda.ts:193-199)") {
    val j = doc(
      word("w1", "Empty"), word("w2", "Kept"), word("wv", " "),
      sel("s1", "NOT_SELECTED"),
      kv("v1", "VALUE", Nil, Seq("s1")),
      kv("k1", "KEY", Seq("v1"), Seq("w1")),
      kv("v2", "VALUE", Nil, Seq("wv")),
      kv("k2", "KEY", Seq("v2"), Seq("w2")))
    val r = BlockGraphKernel.extractFromJson(j)
    // "Empty" dropped (value ""), "Kept" dropped too? value is "  " -> trims to "" -> dropped
    assert(r.data == Seq())
  }

  test("case 6b: value with surrounding spaces kept untrimmed") {
    val j = doc(
      word("w1", "K"), word("wv", "v"),
      sel("s0", "SELECTED"),
      kv("v1", "VALUE", Nil, Seq("wv")),
      kv("k1", "KEY", Seq("v1"), Seq("w1")))
    // value text is "v " (trailing space) -> trim "v" != "" -> stored as "v " untrimmed
    assert(BlockGraphKernel.extractFromJson(j).data == Seq("k" -> "v "))
  }

  test("case 7: block cap truncation (no-NextToken quirk, lambda.ts:148-162)") {
    val wordsBefore = (1 to 3).map(i => word(s"w$i", s"t$i"))
    val lineBefore = line("l1", Seq("w1", "w2", "w3"))
    // pad with filler PAGE blocks so the second line falls beyond the cap
    val filler = (1 to 1000).map(i => s"""{"Id":"p$i","BlockType":"PAGE"}""")
    val wordsAfter = Seq(word("wx", "beyond"))
    val lineAfter = line("l2", Seq("wx"))
    val j = doc((wordsBefore :+ lineBefore) ++ filler ++ wordsAfter :+ lineAfter: _*)
    val r = BlockGraphKernel.extractFromJson(j)
    assert(r.text == "t1 t2 t3 ")
  }

  test("case 8: no relationships / dangling ids yield empty text") {
    val j = doc(
      word("w1", "K"),
      kv("k1", "KEY", Seq("missing-id"), Seq("w1")),
      s"""{"Id":"k2","BlockType":"KEY_VALUE_SET","EntityTypes":["KEY"]}""")
    // k1: value block missing -> "" -> dropped; k2: no relationships at all -> "" -> dropped
    assert(BlockGraphKernel.extractFromJson(j).data == Seq())
  }

  test("document text = LINE blocks in order via get_text") {
    val j = doc(
      word("a", "hello"), word("b", "world"), line("l1", Seq("a", "b")),
      word("c", "bye"), line("l2", Seq("c")))
    assert(BlockGraphKernel.extractFromJson(j).text == "hello world bye ")
  }

  test("malformed json and missing payload produce Empty (Op-25: never throw)") {
    assert(BlockGraphKernel.extractFromJson("{nope") == BlockGraphKernel.Empty)
    assert(BlockGraphKernel.extract("<html>no payload</html>".getBytes("UTF-8")) == BlockGraphKernel.Empty)
    assert(BlockGraphKernel.extract(null) == BlockGraphKernel.Empty)
  }

  test("payload embedded in html is found") {
    val payload = doc(word("w", "x"), line("l", Seq("w")))
    val html = s"<html><body>hi${BlockGraphKernel.PayloadOpen}$payload${BlockGraphKernel.PayloadClose}</body></html>"
    assert(BlockGraphKernel.extract(html.getBytes("UTF-8")).text == "x ")
  }
}
