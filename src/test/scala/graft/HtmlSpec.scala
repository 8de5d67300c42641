package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** HTML extraction seam (SURVEY.md §2.7 F7 real-HTML path): tokenizer
  * edge cases, render→parse round-trip byte equality, and the full
  * engine golden run through the decode+parse fetch pipeline. */
class HtmlSpec extends AnyFunSuite {

  test("tokenizer: attribute quote styles, self-closing, case") {
    val t = HtmlTokenizer.parse("""<IMG SRC="a.png" alt='x y' loading=lazy />""", 0).get
    assert(t.name === "img")
    assert(t.attrs("src") === "a.png")
    assert(t.attrs("alt") === "x y")
    assert(t.attrs("loading") === "lazy")
    assert(!t.closing)
    val c = HtmlTokenizer.parse("</p>", 0).get
    assert(c.name === "p" && c.closing)
  }

  test("entities: escape/unescape round-trip, numeric refs") {
    val s = """a & b < c > "d" 'e' — plain"""
    assert(HtmlTokenizer.unescape(HtmlTokenizer.escape(s)) === s)
    assert(HtmlTokenizer.unescape("&#65;&amp;&#97;") === "A&a")
    assert(HtmlTokenizer.unescape("& notanentity ; &zzzz;") === "& notanentity ; &zzzz;")
  }

  test("entities: supplementary code points and hex refs decode; invalid left intact") {
    // U+1F600 (😀) as decimal and hex — must expand to a surrogate pair,
    // not a truncated BMP char
    assert(HtmlTokenizer.unescape("&#128512;") === new String(Character.toChars(0x1F600)))
    assert(HtmlTokenizer.unescape("&#x1F600;") === new String(Character.toChars(0x1F600)))
    assert(HtmlTokenizer.unescape("&#x41;&#X61;") === "Aa")
    // out-of-range / surrogate / garbage references stay verbatim
    assert(HtmlTokenizer.unescape("&#1114112;") === "&#1114112;") // > U+10FFFF
    assert(HtmlTokenizer.unescape("&#xD800;") === "&#xD800;")     // surrogate
    assert(HtmlTokenizer.unescape("&#x;") === "&#x;")
    assert(HtmlTokenizer.unescape("&#999999999;") === "&#999999999;")
  }

  test("site schemas: two schemas over one page yield the documented different span sequences") {
    val html =
      """<body>
        |<h2>headline</h2>
        |<p>para</p>
        |<img src="img://1">
        |<video poster="vid://poster"></video>
        |<a href="/p/1" data-priority="3">a-link</a>
        |<link href="/feed" rank="2">
        |</body>""".stripMargin
    // default schema: p → text, img (src) → media, a (href, data-priority)
    val (ds, dl) = HtmlSpanExtractor.extract(html)
    assert(ds === Seq(Span("text", "para", null, 0), Span("media", null, "img://1", 1)))
    assert(dl === Seq(DiscoveredLink("/p/1", 3)))
    // site-specific schema: h2 → text, video (poster) → media,
    // link (href, rank) → links with default priority 1
    val custom = SiteSchema(textTags = Set("h2"),
      mediaTags = Set("video"), mediaAttr = "poster",
      linkTags = Set("link"), linkAttr = "href",
      priorityAttr = "rank", defaultPriority = 1)
    val (cs, cl) = new SchemaSpanExtractor(custom).extract(html)
    assert(cs === Seq(Span("text", "headline", null, 0),
      Span("media", null, "vid://poster", 1)))
    assert(cl === Seq(DiscoveredLink("/feed", 2)))
    // registry resolution: exact > wildcard > default
    val reg = SiteSchemas(
      exact = Map("shop.example" -> custom),
      wildcard = Seq(("*.example", SiteSchema(textTags = Set("p", "h2")))))
    assert(reg.forHost("shop.example") === custom)
    assert(reg.forHost("x.example").textTags === Set("p", "h2"))
    assert(reg.forHost("elsewhere.net") === SiteSchema.Default)
    assert(reg.extractorFor("elsewhere.net") eq HtmlSpanExtractor)
  }

  test("extractor: p text, media src, links with priority, comments/script skipped") {
    val html =
      """<html><head><title>t</title><script>var x = "<p>no</p>";</script></head>
        |<body><!-- <p>comment</p> -->
        |<p>hello &amp; <b>world</b></p>
        |<img src="media://h/asset/1" alt="">
        |<p>second</p>
        |<a href="/p/3" data-priority="7">go</a>
        |<a href='/p/4'>default pri</a>
        |<a data-priority="2">no href, skipped</a>
        |</body></html>""".stripMargin
    val (spans, links) = HtmlSpanExtractor.extract(html)
    assert(spans === Seq(
      Span("text", "hello & world", null, 0),
      Span("media", null, "media://h/asset/1", 1),
      Span("text", "second", null, 2)))
    assert(links === Seq(DiscoveredLink("/p/3", 7), DiscoveredLink("/p/4", 5)))
  }

  test("extractor tolerates malformed input without throwing") {
    for (junk <- Seq("", "<", "<p>unclosed", "<a href=", "<<<>>>", "<p><a </p>",
        "text only", "<!-- unterminated", "<script>forever")) {
      HtmlSpanExtractor.extract(junk) // must not throw
    }
  }

  test("render -> parse round-trip is byte-equal for every page of a web") {
    val web = SyntheticWeb(nHosts = 6, pagesPerHost = 10, megaFactor = 3)
    var checked = 0
    for (h <- 0 until 6; p <- 0 until web.pagesOf(web.hostName(h))) {
      val u = s"http://${web.hostName(h)}/p/$p"
      val (spans, links) = web.content(u).get
      val html = HtmlRenderer.render(u, spans, links)
      val (ps, pl) = HtmlSpanExtractor.extract(html)
      assert(ps === spans, s"span mismatch for $u")
      assert(pl === links, s"link mismatch for $u")
      checked += 1
    }
    assert(checked > 60)
  }

  test("round-trip survives hostile text (entity-critical characters)") {
    val spans = Seq(
      Span("text", """<script>alert("x")</script> & <p> 'q' """, null, 0),
      Span("media", null, """media://h/a?b=1&c="2"""", 1),
      Span("text", "", null, 2))
    val links = Seq(DiscoveredLink("""/p/1?x=<&>"'""", 9))
    val html = HtmlRenderer.render("t", spans, links)
    val (ps, pl) = HtmlSpanExtractor.extract(html)
    assert(ps === spans)
    assert(pl === links)
  }

  test("golden: engine over the HTML decode+parse fetch path equals the simulator") {
    val spark = SparkTestBase.spark
    val web = SyntheticWeb(nHosts = 5, pagesPerHost = 7, megaFactor = 3)
    val cfg = CrawlConfig(numBuckets = 8, roundMs = 500, maxRounds = 5,
      parseHtml = true)
    val seeds = web.seedUrls(10)
    val sim = graft.sim.RefSimulator.run(web, seeds, cfg)
    val dir = java.nio.file.Files.createTempDirectory("graft-html").toString
    val eng = new graft.engine.CrawlEngine(spark, web, cfg, dir)
    eng.init(seeds)
    eng.run()
    import spark.implicits._
    val order = eng.crawlLog().select("url_canon").as[String].collect().toVector
    assert(order === sim.crawlOrder)
    // and the HTML path agrees with the DIRECT content path end to end
    val simDirect = graft.sim.RefSimulator.run(web, seeds,
      cfg.copy(parseHtml = false))
    assert(sim.crawlOrder === simDirect.crawlOrder)
    assert(sim.docs === simDirect.docs)
  }
}
