package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Crawler, CrawlerOptions}
import graft.core.{CrawlConfig, SeedRequest, SyntheticWeb}
import graft.sim.RefSimulator

/** The node-crawler-shaped facade: queue()/run() over the BSP engine,
  * including the incremental queue-after-drain pattern, golden-checked
  * against the phased reference simulator. */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("Crawler: queue-after-drain equals the phased simulator (order, seen set, docs)") {
    import spark.implicits._
    val web = SyntheticWeb(nHosts = 6, pagesPerHost = 8, megaFactor = 3)
    val cfg = CrawlConfig(numBuckets = 8, roundMs = 500, maxRounds = 12)
    val phase1 = web.seedUrls(8).map(SeedRequest(_))
    // 4 genuinely new seeds + 2 duplicates of phase 1 (must be dropped
    // by the seen-check, like the reference)
    val phase2 = (web.seedUrls(12).drop(8) ++ web.seedUrls(2)).map(SeedRequest(_))
    val sim = RefSimulator.runPhased(web, Seq(phase1, phase2), cfg)

    val dir = Files.createTempDirectory("graft-api").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 12, numBuckets = 8))
    val r1 = crawler.queue(phase1).run()
    assert(r1.stats.nonEmpty && crawler.queueSize === 0)
    val r2 = crawler.queue(phase2).run()

    val engOrder = r2.crawlLog.select("url_canon").as[String].collect().toVector
    assert(engOrder === sim.crawlOrder, "crawl order mismatch across phases")
    val engSeen = crawler.engine.frontier()
      .select("url_hash").as[Long].collect().toSet
    assert(engSeen === sim.seenSet, "seen set mismatch")
    val engDocs = r2.documents.as[graft.core.Doc].collect()
      .map(d => d.doc_id -> d.spans.sortBy(_.offset)).toMap
    val simDocs = sim.docs.map(d => d.doc_id -> d.spans).toMap
    assert(engDocs.keySet === simDocs.keySet)
    engDocs.foreach { case (id, spans) => assert(spans === simDocs(id), id) }
    // phase-2 duplicates produced no second attempt
    val dupCanon = engOrder.take(2)
    dupCanon.foreach { u =>
      assert(engOrder.count(_ == u) === 1, s"duplicate refetched: $u")
    }
  }

  test("Crawler: enqueue of only-duplicates is a no-op; fresh state routes to init") {
    import spark.implicits._
    val web = SyntheticWeb(nHosts = 3, pagesPerHost = 4)
    val dir = Files.createTempDirectory("graft-api2").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 16, numBuckets = 4))
    val r1 = crawler.queue(web.seedUrls(4).map(SeedRequest(_))).run()
    val attempts1 = r1.crawlLog.count()
    val round1 = crawler.engine.nextRound
    // re-queue the same seeds: all already seen -> nothing changes
    val r2 = crawler.queue(web.seedUrls(4).map(SeedRequest(_))).run()
    assert(r2.crawlLog.count() === attempts1)
    assert(crawler.engine.nextRound === round1)
    assert(crawler.engine.pending().isEmpty)
  }

  test("Crawler: setLimiterProperty throttles a host from the next run") {
    import spark.implicits._
    val web = SyntheticWeb(nHosts = 3, pagesPerHost = 10)
    val dir = Files.createTempDirectory("graft-api5").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 3, numBuckets = 4))
    crawler.queue(web.seedUrls(3).map(SeedRequest(_))).run()
    val phase1Rounds = crawler.engine.nextRound
    // throttle host 0 to one fetch per round, then keep crawling
    crawler.setLimiterProperty(web.hostName(0), rateLimitMs = 500)
    // widen the round budget for the resumed engine
    val more = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 8, numBuckets = 4,
        rateLimits = Map(web.hostName(0) -> 500L)))
    val res = more.run()
    val h0max = res.crawlLog
      .filter($"round" >= phase1Rounds &&
        $"url_canon".contains(web.hostName(0)))
      .groupBy($"round").count()
      .agg(org.apache.spark.sql.functions.max($"count")).head()
    assert(h0max.isNullAt(0) || h0max.getLong(0) <= 1L,
      s"throttle ignored after resume: $h0max")
  }

  test("Crawler: setLimiterProperty(id, 'maxConnections', n) caps a limiter; " +
    "unknown properties are rejected") {
    import spark.implicits._
    val web = SyntheticWeb(nHosts = 3, pagesPerHost = 10)
    val dir = Files.createTempDirectory("graft-api-maxconn").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 4000, maxRounds = 8, numBuckets = 4))
    crawler.setLimiterProperty(web.hostName(0), "maxConnections", 1L)
    crawler.queue(web.seedUrls(3).map(SeedRequest(_))).run()
    val h0max = crawler.engine.crawlLog()
      .filter($"url_canon".contains(web.hostName(0)))
      .groupBy($"round").count()
      .agg(org.apache.spark.sql.functions.max($"count")).head()
    assert(!h0max.isNullAt(0) && h0max.getLong(0) === 1L,
      s"ceiling not enforced: $h0max")
    // another host keeps its full rate quota (> 1 at 4000ms rounds)
    val h1max = crawler.engine.crawlLog()
      .filter($"url_canon".contains(web.hostName(1)))
      .groupBy($"round").count()
      .agg(org.apache.spark.sql.functions.max($"count")).head()
    assert(!h1max.isNullAt(0) && h1max.getLong(0) > 1L,
      s"uncapped host unexpectedly capped: $h1max")
    intercept[IllegalArgumentException] {
      crawler.setLimiterProperty("x", "bogusProperty", 1L)
    }
  }

  test("Crawler: direct() fetches immediately without touching crawl state") {
    val web = SyntheticWeb(nHosts = 3, pagesPerHost = 4)
    val dir = Files.createTempDirectory("graft-api4").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 4, numBuckets = 4))
    val before = crawler.queue(web.seedUrls(2).map(SeedRequest(_))).run()
    val attempts = before.crawlLog.count()
    val round = crawler.engine.nextRound
    // a page the crawl may or may not have reached — direct() answers
    // exactly like the shared content path, immediately
    val u = s"http://${web.hostName(2)}/p/1"
    val got = crawler.direct(u)
    val expect = graft.core.UrlCanonicalizer.canonicalize(u)
      .map(c => graft.core.Fetcher.fetch(web, c, 0, crawler.engine.cfg))
    assert(got === expect && got.nonEmpty)
    // robots-disallowed path -> None; garbage URL -> None
    val blocked = web.policy(web.hostName(0)).rules.find(!_.allow).map(_.prefix)
    blocked.foreach { p =>
      assert(crawler.direct(s"http://${web.hostName(0)}$p/x") === None)
    }
    assert(crawler.direct("not a url") === None)
    // no scheduling state was touched
    assert(crawler.engine.nextRound === round)
    assert(crawler.engine.crawlLog().count() === attempts)
    assert(crawler.queueSize === 0)
  }

  test("Crawler: per-request options ride through queue() to the attempt rows") {
    import spark.implicits._
    val web = SyntheticWeb(nHosts = 3, pagesPerHost = 4)
    val dir = Files.createTempDirectory("graft-api3").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 4, numBuckets = 4))
    val res = crawler
      .queue(SeedRequest(web.seedUrls(1).head, priority = 2,
        userData = """{"job":7}""", method = "HEAD"))
      .run()
    val row = res.crawlLog.filter($"user_data".isNotNull)
      .select($"priority", $"user_data", $"method").collect()
    assert(row.nonEmpty)
    assert(row.head.getInt(0) === 2)
    assert(row.head.getString(1) === """{"job":7}""")
    assert(row.head.getString(2) === "HEAD")
  }

  test("EventEmitter analog: schedule fires per queued request in queue order; " +
    "limiterChange fires on setLimiterProperty and on schedule-round changes") {
    val web = SyntheticWeb(nHosts = 4, pagesPerHost = 6, megaFactor = 2)
    val sched: Long => Map[String, Long] =
      r => if (r == 1L) Map(web.hostName(1) -> 777L) else Map.empty
    val dir = Files.createTempDirectory("graft-events").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 1000, maxRounds = 4, numBuckets = 4,
        rateLimitSchedule = Some(sched)))
    val scheduled = scala.collection.mutable.ListBuffer.empty[String]
    val limiterEvents = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    crawler.onSchedule(q => scheduled += q.url)
    crawler.onLimiterChange((k, v) => limiterEvents += (k -> v))
    // immediate event on setLimiterProperty, before any run
    crawler.setLimiterProperty(web.hostName(0), 250L)
    assert(limiterEvents.toList === List(web.hostName(0) -> 250L))
    val seeds = web.seedUrls(6).distinct
    crawler.queue(seeds.map(SeedRequest(_))).run()
    // schedule events: one per queued request, queue order
    assert(scheduled.toList === seeds.toList)
    // the schedule's round-1 override fired exactly once during the run
    assert(limiterEvents.toList.count(_ == (web.hostName(1) -> 777L)) === 1,
      s"limiterChange events: $limiterEvents")
    // and its EXPIRY fired too: round 2 reverts host 1 to its policy
    // delay, after the 777 event (a state-mirroring listener never
    // reads 777 forever)
    val policyDelay = web.policy(web.hostName(1)).crawl_delay_ms
    val evs = limiterEvents.toList
    val i777 = evs.indexOf(web.hostName(1) -> 777L)
    val iRevert = evs.indexOf(web.hostName(1) -> policyDelay)
    assert(iRevert > i777, s"no revert event after expiry: $evs")
    // the crawl itself is untouched by listeners (golden)
    import spark.implicits._
    val sim = RefSimulator.run(web, seeds,
      CrawlConfig(numBuckets = 4, roundMs = 1000, maxRounds = 4,
        rateLimitOverrides = Map(web.hostName(0) -> 250L),
        rateLimitSchedule = Some(sched)))
    val order = crawler.engine.crawlLog()
      .select("url_canon").as[String].collect().toVector
    assert(order === sim.crawlOrder, "listeners steered the crawl")
  }

  test("limiter events, custom politeness group: schedule expiry reports NO " +
    "fabricated delay (round-5 verdict #1); no-op setLimiterProperty is silent") {
    val web = SyntheticWeb(nHosts = 4, pagesPerHost = 6, megaFactor = 2)
    // a custom group spanning hosts 1+2, overridden for round 1 only
    val sched: Long => Map[String, Long] =
      r => if (r == 1L) Map("grp" -> 777L) else Map.empty
    val dir = Files.createTempDirectory("graft-grp-events").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 1000, maxRounds = 4, numBuckets = 4,
        rateLimitSchedule = Some(sched)))
    val changes = scala.collection.mutable.ListBuffer.empty[(String, Long)]
    val expiries = scala.collection.mutable.ListBuffer.empty[String]
    crawler.onLimiterChange((k, v) => changes += (k -> v))
    crawler.onLimiterExpiry(k => expiries += k)
    // change-only semantics: a no-op set fires nothing (a HOST key, so
    // "grp" stays schedule-only and its round-2 disappearance is a
    // true expiry below)
    crawler.setLimiterProperty(web.hostName(0), 400L)
    crawler.setLimiterProperty(web.hostName(0), 400L)
    assert(changes.toList === List(web.hostName(0) -> 400L),
      s"no-op setLimiterProperty fired: $changes")
    // requests across two hosts share the group's rate bucket
    val seeds = (1 to 2).flatMap(h =>
      (0 until 3).map(p => SeedRequest(s"http://${web.hostName(h)}/p/$p",
        limiter = "grp")))
    crawler.queue(seeds).run()
    // round 1's 777 override fired as a change; its round-2 EXPIRY
    // fired as an expiry-only event — no (grp, <synthetic host
    // policy>) delay was ever reported (web.policy("grp") is the
    // policy of a NONEXISTENT host; reporting it was the round-5 bug)
    assert(changes.toList.contains("grp" -> 777L), s"missing 777 change: $changes")
    val phantom = web.policy("grp").crawl_delay_ms
    assert(!changes.toList.contains("grp" -> phantom),
      s"fabricated policy delay for custom group: $changes")
    assert(expiries.toList === List("grp"), s"expiry events: $expiries")
    // host-keyed limiters keep the concrete revert delay on expiry
    // (the established round-5 behavior, asserted in the test above)
  }

  test("onDrain fires exactly when a run ends drained, not at a maxRounds stop") {
    val web = SyntheticWeb(nHosts = 3, pagesPerHost = 4)
    val dir = Files.createTempDirectory("graft-drain").toString
    var drains = 0
    // run 1 stops at maxRounds=1 with discovered links still pending
    val c1 = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 2000, maxRounds = 1, numBuckets = 4))
    c1.onDrain { drains += 1 }
    c1.queue(web.seedUrls(6).map(SeedRequest(_))).run()
    assert(drains === 0, "drain fired at a maxRounds stop")
    assert(!c1.engine.pending().isEmpty, "fixture did not leave pending work")
    // run 2 resumes the same state and drains for real
    val c2 = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 2000, maxRounds = 32, numBuckets = 4))
    c2.onDrain { drains += 1 }
    c2.run()
    assert(drains === 1, "drain did not fire on the drained run")
    assert(c2.engine.pending().isEmpty)
  }

  test("identity options flow through the facade and surface on onAttempt events") {
    val web = SyntheticWeb(nHosts = 10, pagesPerHost = 6, megaFactor = 2)
    val dir = Files.createTempDirectory("graft-api-ident").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 5, numBuckets = 4,
        userAgents = Seq("fa/1", "fa/2"), rotateUA = true,
        cookieJar = true, proxies = Seq("px0")))
    val uas = scala.collection.mutable.Set.empty[String]
    var sawCookie = false
    crawler.queue(web.seedUrls(10).distinct.map(SeedRequest(_)))
    crawler.run { ev =>
      uas += ev.ua
      if (ev.cookieSent) sawCookie = true
      assert(ev.proxy === "px0")
    }
    assert(uas.size >= 2, s"rotation never rotated: $uas")
    assert(sawCookie, "cookie jar never fired through the facade")
  }

  test("Crawler: run(onAttempt) observes each attempt in crawl order; " +
    "golden equality preserved; later runs replay only their own attempts") {
    import spark.implicits._
    val web = SyntheticWeb(nHosts = 5, pagesPerHost = 6, megaFactor = 2)
    val cfg = CrawlConfig(numBuckets = 4, roundMs = 500, maxRounds = 16)
    val seeds = web.seedUrls(8).distinct.map(SeedRequest(_))
    val sim = RefSimulator.runRequests(web, seeds, cfg)

    val dir = Files.createTempDirectory("graft-api-hook").toString
    val crawler = new Crawler(spark, web, dir,
      CrawlerOptions(rateLimitMs = 500, maxRounds = 16, numBuckets = 4))
    val events = scala.collection.mutable.ArrayBuffer.empty[graft.api.AttemptEvent]
    val res = crawler.queue(seeds).run(events += _)

    // the hook saw every attempt, in exact crawl order — the
    // callback(error, res, done) stream
    val logOrder = res.crawlLog.select("url_canon").as[String].collect().toVector
    assert(events.map(_.urlCanon).toVector === logOrder)
    // and the crawl itself is golden (the hook is observation-only)
    assert(logOrder === sim.crawlOrder)
    // outcome flags are real: ok count matches the scheduler stats, and
    // the error branch (ok=false) surfaces the transient failures
    assert(events.count(_.ok).toLong === res.stats.map(_.fetchedOk).sum)
    assert(events.count(!_.ok).toLong === res.stats.map(_.failed).sum)
    // per-doc flag matches the documents table (a URL can carry TWO
    // events — a failed attempt then a successful retry — so compare
    // the hasDoc event set, not per-event)
    val docIds = res.documents.select("doc_id").as[String].collect().toSet
    assert(events.filter(_.hasDoc).map(_.urlCanon).toSet === docIds)

    // queue-after-drain: the second run's hook sees ONLY new attempts
    val extra = web.seedUrls(12).drop(8).distinct
      .filterNot(u => seeds.map(_.url).contains(u)).map(SeedRequest(_))
    val events2 = scala.collection.mutable.ArrayBuffer.empty[graft.api.AttemptEvent]
    crawler.queue(extra).run(events2 += _)
    val r1MaxRound = events.map(_.round).max
    assert(events2.nonEmpty && events2.forall(_.round > r1MaxRound),
      "second run replayed first-run attempts")
  }
}
