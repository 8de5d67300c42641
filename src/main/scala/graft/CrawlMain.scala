package graft

import org.apache.spark.sql.SparkSession
import graft.core.{CrawlConfig, SyntheticWeb}
import graft.engine.CrawlEngine

/** spark-submit entry point for the crawl engine (BASELINE.json:6:
  * "launched via spark-submit on multi-executor clusters").
  *
  * Usage:
  *   CrawlMain <stateDir> [nHosts] [pagesPerHost] [megaFactor]
  *             [nSeeds] [maxRounds] [roundMs] [numBuckets]
  *
  * Re-running with an existing <stateDir> resumes from the last
  * committed IceLite snapshot (checkpoint/resume, BASELINE.json:14).
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: CrawlMain <stateDir> [nHosts] [pagesPerHost] " +
        "[megaFactor] [nSeeds] [maxRounds] [roundMs] [numBuckets]")
      sys.exit(2)
    }
    val stateDir = args(0)
    def argInt(i: Int, default: Int) =
      if (args.length > i) args(i).toInt else default
    val nHosts = argInt(1, 20)
    val pagesPerHost = argInt(2, 50)
    val megaFactor = argInt(3, 8)
    val nSeeds = argInt(4, 40)
    val maxRounds = argInt(5, 12)
    val roundMs = argInt(6, 1000)
    val numBuckets = argInt(7, 32)

    // spark-submit injects spark.master; standalone runs fall back to
    // local[SPARK_GRAFT_CPUS] (sandbox has no cluster).
    val master = sys.props.get("spark.master")
      .orElse(sys.env.get("SPARK_GRAFT_MASTER"))
      .getOrElse(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val web = SyntheticWeb(nHosts = nHosts, pagesPerHost = pagesPerHost,
      megaFactor = megaFactor)
    // SPARK_GRAFT_SEEN_FILTER=cuckoo drives the alternative seen
    // sketch end to end (the store is typed at init; resume with the
    // matching value)
    val cfg = CrawlConfig(numBuckets = numBuckets, roundMs = roundMs,
      maxRounds = maxRounds,
      seenFilter = sys.env.getOrElse("SPARK_GRAFT_SEEN_FILTER", "bloom"))
    val eng = new CrawlEngine(spark, web, cfg, stateDir)
    if (eng.ice.currentSnapshotId("frontier").isEmpty) {
      println(s"[crawl] seeding $nSeeds URLs into $stateDir")
      eng.init(web.seedUrls(nSeeds))
    } else {
      println(s"[crawl] resuming $stateDir from round ${eng.nextRound}")
    }
    val t0 = System.nanoTime()
    val stats = eng.run()
    val secs = (System.nanoTime() - t0) / 1e9
    stats.foreach { s =>
      println(f"[crawl] round=${s.round}%3d candidates=${s.candidates}%6d " +
        f"admitted=${s.admitted}%6d ok=${s.fetchedOk}%6d failed=${s.failed}%5d " +
        f"discovered=${s.discovered}%7d enqueued=${s.enqueued}%6d")
    }
    val scheduled = stats.map(_.admitted).sum + stats.map(_.enqueued).sum
    println(f"[crawl] rounds=${stats.size} urls_scheduled+deduped=$scheduled " +
      f"wall=$secs%.1fs throughput=${scheduled / math.max(secs, 1e-9)}%.0f urls/s")
    println(s"[crawl] frontier rows=${eng.frontier().count()} " +
      s"docs=${eng.documents().count()} crawl_log=${eng.crawlLog().count()}")
    spark.stop()
  }
}
