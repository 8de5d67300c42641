package graft.core

/** The deterministic synthetic "HTTP" fetch + extract step
  * (SURVEY.md §2.1 S3 + §2.7 F6/F7), shared verbatim between the Spark
  * engine's per-partition fetcher and the reference simulator. This is
  * content, not scheduling: in a real deployment this function is
  * replaced by a pooled HTTP client inside `mapPartitions` with the same
  * signature.
  */
object Fetcher {
  /** Fetch outcome: `ok=false` models a transient failure (retryable);
    * `ok=true` with empty spans+links models a 404/out-of-web URL. */
  def fetch(web: SyntheticWeb, urlCanon: String, retryCount: Int, cfg: CrawlConfig): FetchResult = {
    if (web.fetchFails(urlCanon, retryCount, cfg)) FetchResult(ok = false, Nil, Nil)
    else if (cfg.parseHtml) {
      // production-shaped path: bytes → charset sniff → decode → HTML
      // parse (byte-identical to the direct path by the round-trip
      // property, HtmlSpec)
      web.pageHtmlBytes(urlCanon) match {
        case None => FetchResult(ok = true, Nil, Nil)
        case Some(bytes) =>
          val html = CharsetSniffer.decodeWith(bytes,
            incomingEncoding = cfg.incomingEncoding,
            forceUTF8 = cfg.forceUTF8)
          // per-site declarative schema (default registry → the shared
          // HtmlSpanExtractor instance, allocation-free)
          val extractor = cfg.siteSchemas
            .extractorFor(UrlCanonicalizer.hostOf(urlCanon))
          val (spans, links) = extractor.extract(html)
          FetchResult(ok = true, spans, links.take(SpanExtractor.MaxLinksPerPage))
      }
    } else web.content(urlCanon) match {
      case None => FetchResult(ok = true, Nil, Nil)
      case Some((spans, links)) =>
        // content() IS the page (the textual format is a render of it;
        // SpanExtractor.extract(page(u)) == content(u) is property-
        // tested), so the hot path skips the render+reparse round-trip.
        FetchResult(ok = true, spans, links.take(SpanExtractor.MaxLinksPerPage))
    }
  }
}
