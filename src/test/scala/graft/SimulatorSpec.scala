package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.sim.RefSimulator

class SimulatorSpec extends AnyFunSuite {
  private val web = SyntheticWeb(nHosts = 6, pagesPerHost = 8, megaFactor = 3)
  private val cfg = CrawlConfig(numBuckets = 8, roundMs = 500, maxRounds = 8)
  private val seeds = web.seedUrls(12)

  test("simulator is deterministic") {
    val a = RefSimulator.run(web, seeds, cfg)
    val b = RefSimulator.run(web, seeds, cfg)
    assert(a.crawlOrder === b.crawlOrder)
    assert(a.seenSet === b.seenSet)
    assert(a.docs === b.docs)
  }

  test("politeness invariant: per host per round fetches <= quota") {
    val res = RefSimulator.run(web, seeds, cfg)
    // reconstruct per-round hosts from crawl order via stats slicing
    var idx = 0
    res.stats.foreach { s =>
      val roundUrls = res.crawlOrder.slice(idx, idx + s.admitted.toInt)
      idx += s.admitted.toInt
      roundUrls.groupBy(UrlCanonicalizer.hostOf).foreach { case (host, urls) =>
        val quota = web.policy(host).quota(cfg.roundMs)
        assert(urls.size <= quota, s"host $host exceeded quota in round ${s.round}")
      }
    }
  }

  test("global cap respected; capped run fetches a prefix-compatible set") {
    val capped = RefSimulator.run(web, seeds, cfg.copy(maxPerRound = Some(5)))
    capped.stats.foreach(s => assert(s.admitted <= 5))
  }

  test("seen set contains every crawled URL; no URL fetched twice successfully") {
    val res = RefSimulator.run(web, seeds, cfg)
    res.crawlOrder.foreach { u =>
      assert(res.seenSet.contains(Hashing.xxhash64(u)))
    }
    // successful fetches are unique per URL (retries may repeat a URL)
    val done = res.finalEntries.filter(_.state == FrontierEntry.Done).map(_.urlCanon)
    assert(done.distinct.size === done.size)
  }

  test("robots: no crawled URL under a disallowed prefix") {
    val res = RefSimulator.run(web, seeds, cfg.copy(maxRounds = 6))
    res.crawlOrder.foreach { u =>
      val host = UrlCanonicalizer.hostOf(u)
      assert(RobotsMatcher.allows(web.policy(host).rules, UrlCanonicalizer.pathOf(u)),
        s"crawled disallowed url $u")
    }
  }

  test("docs carry interleaved spans with contiguous offsets") {
    val res = RefSimulator.run(web, seeds, cfg.copy(maxRounds = 4))
    assert(res.docs.nonEmpty)
    res.docs.foreach { d =>
      d.spans.zipWithIndex.foreach { case (s, i) =>
        assert(s.offset === i)
        assert(s.kind == "text" || s.kind == "media")
        if (s.kind == "text") assert(s.text != null && s.media_ref == null)
        else assert(s.media_ref != null && s.text == null)
      }
    }
  }
}
