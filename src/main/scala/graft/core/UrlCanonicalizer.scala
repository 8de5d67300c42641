package graft.core

/** Pure, deterministic URL canonicalization (SURVEY.md §2.2 P3).
  *
  * Mirrors the seenreq-style normalization node-crawler's companion uses
  * [PK:med, SURVEY.md §1.1]: lowercase scheme+host, strip default port,
  * strip fragment, normalize path (`.`/`..`/duplicate slashes, empty →
  * "/", trailing slash removed except root), stable-sort query params.
  *
  * Shared verbatim between the Spark engine (as a deterministic UDF) and
  * the reference simulator — canonicalization is *content*, not
  * scheduling, so sharing is allowed (SURVEY.md §5.2).
  *
  * Idempotence (`canon(canon(u)) == canon(u)`) is property-tested.
  */
object UrlCanonicalizer {

  /** Canonicalize an absolute http(s) URL. Non-http(s) or unparsable
    * input returns None (dropped at enqueue time).
    *
    * Fast path: most URLs on a crawl's hot path are ALREADY canonical
    * (links resolved against a canonical base re-canonicalize to
    * themselves), and the rebuild is ~10 short-lived allocations per
    * call at millions of calls per round — so a single allocation-free
    * scan first proves `canonicalize(s) == s` and returns the input
    * unchanged. The scan is strictly conservative: anything it is not
    * sure about (ports, queries, dot segments, uppercase, whitespace)
    * falls through to the full rebuild with identical results
    * (property-tested: fast == slow on every generator input). */
  def canonicalize(raw: String): Option[String] =
    if (isCanonicalSimple(raw)) Some(raw) else canonicalizeSlow(raw)

  /** One-pass, allocation-free "already canonical, no port/query" test:
    * exact lowercase scheme, lowercase host of [a-z0-9.-], a path with
    * no `?`/`#`/`//`/dot-segments and no trailing slash (except the
    * bare root "/"). True ⇒ the full rebuild would return the input
    * string unchanged. */
  private[graft] def isCanonicalSimple(s: String): Boolean = {
    val n = s.length
    if (n < 8) return false
    // no surrounding whitespace (trim would change it)
    if (s.charAt(0) <= ' ' || s.charAt(n - 1) <= ' ') return false
    val hostStart =
      if (s.startsWith("http://")) 7
      else if (s.startsWith("https://")) 8
      else return false
    var i = hostStart
    // host: [a-z0-9.-]+ — any ':' (port), '@' (userinfo), uppercase or
    // other byte sends it to the slow path
    while (i < n && s.charAt(i) != '/') {
      val c = s.charAt(i)
      val okc = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '.' || c == '-'
      if (!okc) return false
      i += 1
    }
    if (i == hostStart) return false // empty host
    if (i == n) return false // no path: canonical form appends "/"
    if (i == n - 1) return true // bare root "/": canonical as-is
    // path: no query/fragment, no "//", no "." segment starts, no
    // trailing slash
    var prev = '/'
    i += 1
    while (i < n) {
      val c = s.charAt(i)
      if (c == '?' || c == '#') return false
      if (prev == '/' && (c == '/' || c == '.')) return false
      prev = c
      i += 1
    }
    prev != '/'
  }

  private[graft] def canonicalizeSlow(raw: String): Option[String] = {
    val s = raw.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return None
    val scheme = s.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    val rest = s.substring(schemeEnd + 3)
    if (rest.isEmpty) return None

    // split off fragment first (strip), then query, then path
    val noFrag = { val i = rest.indexOf('#'); if (i >= 0) rest.substring(0, i) else rest }
    val (authority, pathQuery) = {
      val i = noFrag.indexOf('/')
      if (i >= 0) (noFrag.substring(0, i), noFrag.substring(i)) else (noFrag, "")
    }
    if (authority.isEmpty) return None
    val hostPort = {
      // userinfo is not part of the crawl domain; strip if present
      val i = authority.lastIndexOf('@')
      if (i >= 0) authority.substring(i + 1) else authority
    }
    val (host, port) = {
      val i = hostPort.lastIndexOf(':')
      if (i >= 0 && hostPort.drop(i + 1).forall(_.isDigit) && i > 0)
        (hostPort.substring(0, i).toLowerCase, hostPort.substring(i + 1))
      else (hostPort.toLowerCase, "")
    }
    if (host.isEmpty) return None
    val portPart =
      if (port.isEmpty || (scheme == "http" && port == "80") ||
          (scheme == "https" && port == "443")) ""
      else ":" + port

    val (rawPath, rawQuery) = {
      val i = pathQuery.indexOf('?')
      if (i >= 0) (pathQuery.substring(0, i), pathQuery.substring(i + 1))
      else (pathQuery, "")
    }
    val path = normalizePath(rawPath)
    val query = normalizeQuery(rawQuery)
    Some(scheme + "://" + host + portPart + path + query)
  }

  /** Resolve a possibly-relative link against a canonical base URL.
    * Handles absolute URLs, protocol-relative (`//h/p`), root-relative
    * (`/p`), and directory-relative (`p`). */
  def resolve(base: String, link: String): Option[String] = {
    val l = link.trim
    if (l.isEmpty) None
    else if (l.contains("://")) Some(l)
    else {
      val schemeEnd = base.indexOf("://")
      if (schemeEnd <= 0) None
      else {
        val scheme = base.substring(0, schemeEnd)
        val rest = base.substring(schemeEnd + 3)
        val slash = rest.indexOf('/')
        val authority = if (slash >= 0) rest.substring(0, slash) else rest
        if (l.startsWith("//")) Some(scheme + ":" + l)
        else if (l.startsWith("/")) Some(scheme + "://" + authority + l)
        else {
          val basePath = if (slash >= 0) rest.substring(slash) else "/"
          val noQuery = { val i = basePath.indexOf('?'); if (i >= 0) basePath.substring(0, i) else basePath }
          val dir = noQuery.substring(0, noQuery.lastIndexOf('/') + 1)
          Some(scheme + "://" + authority + dir + l)
        }
      }
    }
  }

  /** Host of a canonical URL (already lowercased). */
  def hostOf(canonical: String): String = {
    val rest = canonical.substring(canonical.indexOf("://") + 3)
    val i = rest.indexOf('/')
    val auth = if (i >= 0) rest.substring(0, i) else rest
    val j = auth.lastIndexOf(':')
    if (j >= 0 && auth.drop(j + 1).forall(_.isDigit)) auth.substring(0, j) else auth
  }

  /** Path (+nothing else) of a canonical URL, for robots matching. */
  def pathOf(canonical: String): String = {
    val rest = canonical.substring(canonical.indexOf("://") + 3)
    val i = rest.indexOf('/')
    if (i < 0) "/"
    else {
      val pq = rest.substring(i)
      val q = pq.indexOf('?')
      if (q >= 0) pq.substring(0, q) else pq
    }
  }

  private def normalizePath(p: String): String = {
    if (p.isEmpty) return "/"
    val segs = p.split("/", -1).toList.filter(s => s.nonEmpty && s != ".")
    val out = segs.foldLeft(List.empty[String]) {
      case (acc, "..") => if (acc.isEmpty) acc else acc.init
      case (acc, s)    => acc :+ s
    }
    if (out.isEmpty) "/" else "/" + out.mkString("/")
  }

  private def normalizeQuery(q: String): String = {
    if (q.isEmpty) return ""
    val parts = q.split("&", -1).filter(_.nonEmpty)
    if (parts.isEmpty) "" else "?" + parts.sorted.mkString("&")
  }
}
