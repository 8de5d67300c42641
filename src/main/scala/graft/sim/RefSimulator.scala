package graft.sim

import scala.collection.mutable
import graft.core._
import graft.core.Hashing.xxhash64

/** Single-threaded reference simulator (SURVEY.md §5.2 item 1).
  *
  * Implements the documented node-crawler scheduling semantics under the
  * logical-clock model, with NO Spark and NO code shared with the
  * engine's scheduler — only the pure content functions
  * (canonicalize / robots / fetch / extract) are shared, per the
  * SURVEY.md §5.2 contract. Its outputs (crawl order, final URL-seen
  * set, span rows) are the golden fixtures the Spark engine must match
  * (BASELINE.json:6).
  *
  * Semantics:
  *  - per-host priority queues: priority asc, FIFO by discovered_seq,
  *    final tie-break url_hash (node-crawler limiter queues [PK:high])
  *  - logical-clock politeness: host serves ≤ quota(roundMs/crawl_delay)
  *    per BSP round
  *  - global per-round cap (analog of `maxConnections`) applied on the
  *    total order (priority, discovered_seq, url_hash)
  *  - seen-dedup at enqueue time (seenreq semantics [PK:med]); robots
  *    checked before enqueue; within-round duplicate discoveries resolve
  *    to the minimum discovered_seq (unique by construction)
  *  - transient failures retried with backoff due_round = r + 1 + retry,
  *    dropped past maxRetries
  */
object RefSimulator {

  final case class SimEntry(
      urlCanon: String,
      urlHash: Long,
      host: String,
      priority: Int,
      seq: Long,
      var retryCount: Int,
      var dueRound: Long,
      var state: String,
      // per-request politeness group (node-crawler `limiter` [PK:high]);
      // null = the default limiter, the URL's host
      limiter: String = null,
      // opaque per-request payload, visible to the preRequest hook
      userData: String = null,
      // per-request HTTP options (node-crawler `queue({method,
      // headers})` [PK:high]) — reach the fetch itself (HEAD,
      // Accept-Encoding negotiation); null for link-discovered entries
      method: String = null,
      headers: String = null) {
    def limiterKey: String = if (limiter == null) host else limiter
  }

  final case class RoundStats(
      round: Long, candidates: Long, admitted: Long, fetchedOk: Long,
      failed: Long, discovered: Long, enqueued: Long)

  /** Resolved per-attempt HTTP identity, in crawl order — the golden
    * twin of the engine's attempt-row ua/proxy/cookie_sent columns. */
  final case class AttemptMeta(
      urlCanon: String, ua: String, proxy: String, cookieSent: Boolean)

  final case class SimResult(
      crawlOrder: Vector[String],
      seenSet: Set[Long],
      docs: Vector[Doc],
      rounds: Int,
      stats: Vector[RoundStats],
      finalEntries: Vector[SimEntry],
      attempts: Vector[AttemptMeta] = Vector.empty)

  def run(web: SyntheticWeb, seeds: Seq[String], cfg: CrawlConfig): SimResult =
    runRequests(web, seeds.map(SeedRequest(_)), cfg)

  /** Per-request options form (node-crawler `queue()` semantics):
    * per-seed priority + opaque userData. */
  def runRequests(web: SyntheticWeb, reqs: Seq[SeedRequest],
      cfg: CrawlConfig): SimResult = runPhased(web, Seq(reqs), cfg)

  /** Phased form (node-crawler queue-after-drain): each phase's
    * requests are enqueued when the previous phase drains, with
    * `discovered_seq` continuing strictly after every existing row and
    * due = the round after the drain — the engine's
    * `enqueueRequests` contract. One phase ≡ `runRequests`. */
  def runPhased(web: SyntheticWeb, phases: Seq[Seq[SeedRequest]],
      cfg: CrawlConfig): SimResult = {
    val entries = mutable.LinkedHashMap.empty[Long, SimEntry]
    val crawlOrder = Vector.newBuilder[String]
    val docs = Vector.newBuilder[Doc]
    val stats = Vector.newBuilder[RoundStats]
    val attempts = Vector.newBuilder[AttemptMeta]
    // cookie jar: hosts that granted their session cookie in a
    // strictly EARLIER round (node-crawler `jar` under the logical
    // clock — same rule the engine derives from the retired table)
    val cookieHosts = mutable.Set.empty[String]
    val policyCache = mutable.Map.empty[String, HostPolicy]
    def policyOf(host: String): HostPolicy =
      policyCache.getOrElseUpdate(host, web.policy(host))

    // candidate discovery: (canonUrl, hash, host, priority, seq, limiter)
    final case class Cand(canon: String, hash: Long, host: String,
        priority: Int, seq: Long, limiter: String = null,
        userData: String = null, method: String = null, headers: String = null)

    def toCand(raw: String, priority: Int, seq: Long,
        limiter: String = null, userData: String = null,
        method: String = null, headers: String = null): Option[Cand] =
      UrlCanonicalizer.canonicalize(raw).flatMap { canon =>
        val host = UrlCanonicalizer.hostOf(canon)
        val path = UrlCanonicalizer.pathOf(canon)
        if (!RobotsMatcher.allows(policyOf(host).rules, path)) None
        else Some(Cand(canon, xxhash64(canon), host, priority, seq, limiter,
          userData, method, headers))
      }

    def enqueue(cands: Seq[Cand], due: Long): Long = {
      // min-seq wins per hash (seqs are unique by construction)
      var added = 0L
      cands.groupBy(_.hash).foreach { case (h, group) =>
        if (!entries.contains(h)) {
          val c = group.minBy(_.seq)
          entries(h) = SimEntry(c.canon, h, c.host, c.priority, c.seq, 0, due,
            FrontierEntry.Pending, c.limiter, c.userData, c.method, c.headers)
          added += 1
        }
      }
      added
    }

    var r = 0L
    var roundsRun = 0

    def drainLoop(): Unit =
      while (r < cfg.maxRounds && entries.values.exists(_.state == FrontierEntry.Pending)) {
      val candidates = entries.values
        .filter(e => e.state == FrontierEntry.Pending && e.dueRound <= r)
        // preRequest gate — identical pure predicate to the engine's
        .filter(e => cfg.preRequest.forall(f => f(
          PreRequest(e.urlCanon, e.host, e.priority, e.retryCount, e.userData))))
        .toVector
      // per-limiter priority dequeue under politeness quota: entries
      // sharing a limiter key share ONE rate bucket (default key =
      // host), node-crawler limiter semantics [PK:high]
      val admitted = candidates
        .groupBy(_.limiterKey)
        .iterator
        .flatMap { case (limKey, es) =>
          val quota = cfg.quotaForAt(limKey, policyOf(limKey).crawl_delay_ms, r)
          es.sortBy(e => (e.priority, e.seq, e.urlHash)).take(quota)
        }
        .toVector
        .sortBy(e => (e.priority, e.seq, e.urlHash))
      val capped = cfg.maxPerRound.fold(admitted)(k => admitted.take(k))

      var ok = 0L; var failed = 0L; var discovered = 0L
      val roundCands = Vector.newBuilder[Cand]
      val okHostsThisRound = mutable.Set.empty[String]
      capped.foreach { e =>
        crawlOrder += e.urlCanon
        // per-attempt HTTP identity — the IDENTICAL HttpIdentity
        // resolution the engine's FetchExtractExpr runs
        val ua = HttpIdentity.uaFor(cfg, e.headers, e.seq)
        val proxy = HttpIdentity.proxyFor(cfg, e.seq)
        val referer = HttpIdentity.refererFor(cfg, e.headers)
        val cookie = cfg.cookieJar && cookieHosts.contains(e.host)
        attempts += AttemptMeta(e.urlCanon, ua, proxy, cookie)
        val res = Fetcher.fetch(web, e.urlCanon, e.retryCount, cfg,
          e.method, e.headers, RequestCtx(ua, cookie, referer))
        if (res.ok) okHostsThisRound += e.host
        if (!res.ok) {
          failed += 1
          e.retryCount += 1
          if (e.retryCount > cfg.maxRetries) e.state = FrontierEntry.Dropped
          else e.dueRound = r + 1 + e.retryCount
        } else {
          ok += 1
          e.state = FrontierEntry.Done
          if (res.spans.nonEmpty || res.links.nonEmpty) docs += Doc(e.urlCanon, res.spans)
          res.links.zipWithIndex.foreach { case (link, k) =>
            discovered += 1
            UrlCanonicalizer.resolve(e.urlCanon, link.url).foreach { abs =>
              roundCands ++= toCand(abs, link.priority, Hashing.childSeq(e.seq, k))
            }
          }
        }
      }
      val enq = enqueue(roundCands.result(), due = r + 1)
      stats += RoundStats(r, candidates.size, capped.size, ok, failed, discovered, enq)
      // cookies granted this round become visible NEXT round (BSP
      // visibility — within-round fetches are concurrent)
      if (cfg.cookieJar) cookieHosts ++= okHostsThisRound
      r += 1
      roundsRun += 1
      // queue-during-crawl: the identical pure injector the engine
      // runs after each completed round, at the identical point —
      // seen-deduped, seq strictly after every existing row, due the
      // upcoming round
      cfg.midRunQueue.foreach { f =>
        val reqs = f(r - 1)
        if (reqs.nonEmpty) {
          val off = if (entries.isEmpty) 0L else entries.values.map(_.seq).max + 1L
          enqueue(reqs.zipWithIndex.flatMap { case (q, i) =>
            toCand(q.url, q.priority, off + i, q.limiter, q.userData,
              q.method, q.headers) }, due = r)
        }
      }
    }

    phases.foreach { phase =>
      val off = if (entries.isEmpty) 0L else entries.values.map(_.seq).max + 1L
      enqueue(phase.zipWithIndex.flatMap { case (q, i) =>
        toCand(q.url, q.priority, off + i, q.limiter, q.userData,
          q.method, q.headers) }, due = r)
      drainLoop()
    }

    SimResult(crawlOrder.result(), entries.keySet.toSet, docs.result(),
      roundsRun, stats.result(), entries.values.toVector, attempts.result())
  }
}
