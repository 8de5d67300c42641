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
