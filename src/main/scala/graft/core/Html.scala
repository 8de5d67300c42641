package graft.core

/** Real-HTML extraction seam (SURVEY.md §2.7 F7 — the cheerio-style
  * selector extraction of node-crawler [PK:high], re-expressed as a
  * dependency-free pull tokenizer + a site-schema mapping).
  *
  * `HtmlTokenizer` is generic: tags with single/double/bare-quoted
  * attributes, comments, script/style skipping, character entities.
  * `HtmlSpanExtractor` maps the token stream to the normative
  * interleaved span schema the way a cheerio selector set would:
  *   - `<p>` element text (inline tags stripped)     → text span
  *   - `<img|source|video|audio src=...>`            → media span
  *   - `<a href=... [data-priority=0..9]>`           → discovered link
  * Everything else (head, anchors' text, unknown tags) is ignored.
  *
  * `HtmlRenderer` emits the synthetic web's content as HTML, so the
  * round-trip `extract(render(content)) == content` is property-tested
  * byte-for-byte (HtmlSpec), and the engine can run its whole fetch
  * path through decode+parse (CrawlConfig.parseHtml) instead of the
  * direct content function — golden-tested against the simulator.
  */
trait PageExtractor {
  def extract(page: String): (Seq[Span], Seq[DiscoveredLink])
}

/** Declarative per-site extraction schema — the fork's defining feature
  * (BASELINE.json "site-specific extraction output" [PK:low]): which
  * elements yield text spans, which yield media spans (and from which
  * attribute), which yield links, and which attribute carries the link
  * priority. The default reproduces the generic mapping exactly, so the
  * golden path is schema-invariant under `SiteSchema.Default`. */
final case class SiteSchema(
    textTags: Set[String] = Set("p"),
    mediaTags: Set[String] = Set("img", "source", "video", "audio"),
    mediaAttr: String = "src",
    linkTags: Set[String] = Set("a"),
    linkAttr: String = "href",
    priorityAttr: String = "data-priority",
    defaultPriority: Int = 5)

object SiteSchema {
  val Default: SiteSchema = SiteSchema()
}

/** host → schema registry: exact host match wins, then the longest
  * `*.suffix` wildcard, then the default schema. */
final case class SiteSchemas(
    exact: Map[String, SiteSchema] = Map.empty,
    wildcard: Seq[(String, SiteSchema)] = Nil, // ("*.shop.example", s)
    default: SiteSchema = SiteSchema.Default) {
  def forHost(host: String): SiteSchema =
    exact.getOrElse(host,
      wildcard.filter { case (pat, _) =>
        pat.startsWith("*.") && host.endsWith(pat.substring(1))
      }.sortBy(-_._1.length).headOption.map(_._2).getOrElse(default))
  def extractorFor(host: String): PageExtractor = {
    val s = forHost(host)
    if (s == SiteSchema.Default) HtmlSpanExtractor else new SchemaSpanExtractor(s)
  }
}

object SiteSchemas {
  val Default: SiteSchemas = SiteSchemas()
}

/** Schema-interpreting extractor: the cheerio-selector analog, driven
  * by a [[SiteSchema]]. `HtmlSpanExtractor` is the default-schema
  * instance (shared verbatim between engine and simulator). */
class SchemaSpanExtractor(schema: SiteSchema) extends PageExtractor {

  def extract(html: String): (Seq[Span], Seq[DiscoveredLink]) = {
    val spans = Seq.newBuilder[Span]
    val links = Seq.newBuilder[DiscoveredLink]
    var offset = 0
    var nLinks = 0
    val n = html.length
    var i = 0

    def skipComment(from: Int): Int = {
      val end = html.indexOf("-->", from)
      if (end < 0) n else end + 3
    }

    def skipRawText(from: Int, tag: String): Int = {
      // script/style content is raw text until the matching close tag
      val close = s"</$tag"
      var j = from
      while (j < n) {
        val k = html.indexOf('<', j)
        if (k < 0) return n
        if (html.regionMatches(true, k, close, 0, close.length)) {
          val gt = html.indexOf('>', k)
          return if (gt < 0) n else gt + 1
        }
        j = k + 1
      }
      n
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) i = n
      else if (html.startsWith("<!--", lt)) i = skipComment(lt + 4)
      else {
        val tag = HtmlTokenizer.parse(html, lt)
        tag match {
          case None => i = lt + 1
          case Some(t) =>
            i = t.end
            if (!t.closing) t.name match {
              case "script" | "style" => i = skipRawText(t.end, t.name)
              case name if schema.textTags(name) =>
                val (text, after) = elementText(html, t.end, name)
                spans += Span("text", text, null, offset)
                offset += 1
                i = after
              case name if schema.mediaTags(name) =>
                t.attrs.get(schema.mediaAttr).foreach { src =>
                  spans += Span("media", null, src, offset)
                  offset += 1
                }
              case name if schema.linkTags(name) =>
                if (nLinks < SpanExtractor.MaxLinksPerPage)
                  t.attrs.get(schema.linkAttr).foreach { href =>
                    val pri = t.attrs.get(schema.priorityAttr)
                      .filter(p => p.nonEmpty && p.forall(_.isDigit))
                      .map(_.toInt).filter(p => p >= 0 && p <= 9)
                      .getOrElse(schema.defaultPriority)
                    links += DiscoveredLink(href, pri)
                    nLinks += 1
                  }
              case _ => ()
            }
        }
      }
    }
    (spans.result(), links.result())
  }

  /** Text content of an element starting after its open tag: raw text
    * segments (entity-decoded) concatenated, inline tags stripped,
    * until the element's close tag. Returns (text, index-after). */
  private def elementText(html: String, from: Int, tag: String): (String, Int) = {
    val sb = new StringBuilder
    var i = from
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        sb ++= HtmlTokenizer.unescape(html.substring(i))
        return (sb.toString, n)
      }
      sb ++= HtmlTokenizer.unescape(html.substring(i, lt))
      if (html.startsWith("<!--", lt)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else HtmlTokenizer.parse(html, lt) match {
        case Some(t) if t.closing && t.name == tag => return (sb.toString, t.end)
        case Some(t) => i = t.end // strip inline tags
        case None => sb += '<'; i = lt + 1
      }
    }
    (sb.toString, n)
  }
}

/** The default-schema extractor instance (engine + simulator share it
  * verbatim; the golden path is schema-invariant under the default). */
object HtmlSpanExtractor extends SchemaSpanExtractor(SiteSchema.Default)

/** Minimal standards-shaped HTML tag tokenizer + entity codec. */
object HtmlTokenizer {

  final case class Tag(name: String, attrs: Map[String, String],
      closing: Boolean, end: Int)

  /** Parse the tag starting at `html(lt) == '<'`; None if not a tag. */
  def parse(html: String, lt: Int): Option[Tag] = {
    val n = html.length
    var i = lt + 1
    if (i >= n) return None
    val closing = html.charAt(i) == '/'
    if (closing) i += 1
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    if (i == nameStart) return None
    val name = html.substring(nameStart, i).toLowerCase
    val attrs = Map.newBuilder[String, String]
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' => i += 1 // self-closing slash
        case _ =>
          val aStart = i
          while (i < n && !html.charAt(i).isWhitespace &&
            html.charAt(i) != '=' && html.charAt(i) != '>' &&
            html.charAt(i) != '/') i += 1
          val aName = html.substring(aStart, i).toLowerCase
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i)
              i += 1
              val vStart = i
              while (i < n && html.charAt(i) != q) i += 1
              attrs += aName -> unescape(html.substring(vStart, i))
              if (i < n) i += 1
            } else {
              val vStart = i
              while (i < n && !html.charAt(i).isWhitespace &&
                html.charAt(i) != '>') i += 1
              attrs += aName -> unescape(html.substring(vStart, i))
            }
          } else if (aName.nonEmpty) attrs += aName -> ""
      }
    }
    Some(Tag(name, attrs.result(), closing, i))
  }

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb ++= "&amp;"
      case '<' => sb ++= "&lt;"
      case '>' => sb ++= "&gt;"
      case '"' => sb ++= "&quot;"
      case c   => sb += c
    }
    sb.toString
  }

  def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          s.substring(i + 1, semi) match {
            case "amp"  => sb += '&'; i = semi + 1
            case "lt"   => sb += '<'; i = semi + 1
            case "gt"   => sb += '>'; i = semi + 1
            case "quot" => sb += '"'; i = semi + 1
            case "apos" => sb += '\''; i = semi + 1
            // numeric character references: decimal &#NNNN; and hex
            // &#xHHHH;. Supplementary code points expand to surrogate
            // pairs via Character.toChars (a bare toChar truncates
            // above U+FFFF); invalid/overflowing references are left
            // untouched, like unrecognized named entities.
            case e if e.startsWith("#") =>
              val (digits, radix) =
                if (e.length > 2 && (e(1) == 'x' || e(1) == 'X'))
                  (e.drop(2), 16)
                else (e.drop(1), 10)
              val valid = digits.nonEmpty &&
                digits.forall(d => Character.digit(d, radix) >= 0)
              val cp = if (valid) {
                try java.lang.Integer.parseInt(digits, radix)
                catch { case _: NumberFormatException => -1 }
              } else -1
              if (cp >= 0 && cp <= 0x10FFFF &&
                  !(cp >= 0xD800 && cp <= 0xDFFF)) {
                sb ++= new String(Character.toChars(cp)); i = semi + 1
              } else { sb += c; i += 1 }
            case _ => sb += c; i += 1
          }
        } else { sb += c; i += 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}

/** Renders content to HTML (the synthetic web's HTML face). */
object HtmlRenderer {
  def render(title: String, spans: Seq[Span],
      links: Seq[DiscoveredLink]): String = {
    val sb = new StringBuilder(1024)
    sb ++= "<!doctype html>\n<html><head><meta charset=\"utf-8\"><title>"
    sb ++= HtmlTokenizer.escape(title)
    sb ++= "</title>\n<style>p { margin: 0 }</style>\n"
    sb ++= "<script>/* not content: <p>ignored</p> */</script></head>\n<body>\n"
    spans.foreach { s =>
      if (s.kind == "text") {
        sb ++= "<p>"; sb ++= HtmlTokenizer.escape(s.text); sb ++= "</p>\n"
      } else {
        sb ++= "<img src=\""; sb ++= HtmlTokenizer.escape(s.media_ref)
        sb ++= "\" alt=\"\">\n"
      }
    }
    links.foreach { l =>
      sb ++= s"""<a href="${HtmlTokenizer.escape(l.url)}" data-priority="${l.priority}">"""
      sb ++= "follow</a>\n"
    }
    sb ++= "<!-- rendered by HtmlRenderer --></body></html>\n"
    sb.toString
  }
}
