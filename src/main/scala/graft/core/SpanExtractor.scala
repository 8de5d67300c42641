package graft.core

/** Site-schema extractor (SURVEY.md §2.7 F7): parses the synthetic page
  * format into the normative interleaved span sequence
  * (kind, text, media_ref, offset) of BASELINE.json:15, plus discovered
  * links (SURVEY.md §2.8 U3).
  *
  * Pure function, shared verbatim between engine and simulator — the
  * per-row invariant is span-sequence *byte* equality, so there must be
  * exactly one implementation of content extraction (SURVEY.md §7.3
  * item 4). Links are capped at 63 per page so the parallelism-invariant
  * `discovered_seq = parent*64 + 1 + idx` encoding never overflows a
  * level (SURVEY.md §7.3 item 1).
  */
object SpanExtractor extends PageExtractor {
  val MaxLinksPerPage = 63

  def extract(page: String): (Seq[Span], Seq[DiscoveredLink]) = {
    val spans = Seq.newBuilder[Span]
    val links = Seq.newBuilder[DiscoveredLink]
    var offset = 0
    var nLinks = 0
    page.linesIterator.foreach { line =>
      if (line.startsWith("t:")) {
        spans += Span("text", line.substring(2), null, offset)
        offset += 1
      } else if (line.startsWith("m:")) {
        spans += Span("media", null, line.substring(2), offset)
        offset += 1
      } else if (line.startsWith("l:") && nLinks < MaxLinksPerPage) {
        val rest = line.substring(2)
        val i = rest.indexOf(':')
        if (i > 0) {
          val pri = rest.substring(0, i)
          if (pri.forall(_.isDigit)) {
            links += DiscoveredLink(rest.substring(i + 1), pri.toInt)
            nLinks += 1
          }
        }
      }
    }
    (spans.result(), links.result())
  }
}
