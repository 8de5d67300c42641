package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.core.{CrawlConfig, SyntheticWeb}
import graft.engine.CrawlEngine

/** One parallelism level of the crawl scaling bench, run in its own
  * JVM (spawned by Bench) so that EVERY resource scales with the
  * simulated cluster size — task threads, GC threads, and heap. In a
  * single shared JVM the small-"cluster" run would borrow the big
  * cluster's GC threads and heap, flattering N and understating the
  * N→4N efficiency.
  *
  * Prints one line: `[levelbench] <tput_urls_per_s> <wall_s>`.
  */
object CrawlLevelBench {

  private[graft] def benchTmp: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  private[graft] def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-c$cores")
      // 3x over-partitioning smooths stragglers in the skewed window
      .config("spark.sql.shuffle.partitions", (cores * 3).toString)
      // AQE off for the bench loop: its per-stage driver re-planning is
      // pure serial overhead here (the loop's partition counts are
      // already tuned), measured at ~10% of c8 wall
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      // only explicit broadcast() hints broadcast: a borderline-sized
      // auto-broadcast is built single-threaded on the driver — a
      // serial, non-scaling step
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The measured web: realistic multi-KB pages (≈55 spans × ≈13
    * words), 8000 hosts + one mega-host, ~5M-URL reachable space. */
  private[graft] def measuredWeb = SyntheticWeb(
    nHosts = 8000, pagesPerHost = 600, megaFactor = 12,
    spanBase = 40, spanRange = 30, wordBase = 8, wordRange = 10)

  private[graft] def runCrawl(spark: SparkSession, web: SyntheticWeb,
      cfg: CrawlConfig, seeds: Int): (Double, Double) = {
    val dir = Files.createTempDirectory(benchTmp, "graft-bench").toString
    // saltFanout=1: at bench quotas salt×quota ≥ any host's pending
    // set, so the salting phase would be a pure extra shuffle+sort
    val eng = new CrawlEngine(spark, web, cfg, dir, saltFanout = 1)
    eng.init(web.seedUrls(seeds))
    val t0 = System.nanoTime()
    val stats = eng.run()
    val secs = (System.nanoTime() - t0) / 1e9
    val scheduled = stats.map(_.admitted).sum + stats.map(_.enqueued).sum
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala.toSeq
      .reverse.foreach(Files.deleteIfExists(_))
    (scheduled.toDouble / secs, secs)
  }

  /** warmup (JIT + codegen) then best-of-`reps` measured runs. */
  private[graft] def benchAt(spark: SparkSession, rounds: Int, reps: Int,
      seeds: Int, roundMs: Long): (Double, Double) = {
    runCrawl(spark, SyntheticWeb(nHosts = 400, pagesPerHost = 80, megaFactor = 4,
      spanBase = 40, spanRange = 30, wordBase = 8, wordRange = 10),
      CrawlConfig(numBuckets = 64, roundMs = 5000L, maxRounds = 2), seeds = 20000)
    (1 to reps).map { _ =>
      runCrawl(spark, measuredWeb,
        CrawlConfig(numBuckets = 64, roundMs = roundMs, maxRounds = rounds,
          retainSnapshots = Some(2), packedSpans = true),
        seeds = seeds)
    }.maxBy(_._1)
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rounds = args(1).toInt
    val reps = args(2).toInt
    val seeds = if (args.length > 3) args(3).toInt else 300000
    val roundMs = if (args.length > 4) args(4).toLong else 50000L
    val spark = newSession(cores)
    val (tput, wall) = benchAt(spark, rounds, reps, seeds, roundMs)
    spark.stop()
    println(f"[levelbench] $tput%.1f $wall%.2f")
  }

  /** Spawn a fresh JVM for `cores` with proportional heap + GC threads.
    * Returns (tput, wall). */
  def spawn(cores: Int, rounds: Int, reps: Int, heapGb: Int,
      seeds: Int = 300000, roundMs: Long = 50000L): (Double, Double) = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx${heapGb}g",
      "-XX:+UseParallelGC",
      s"-XX:ParallelGCThreads=${math.max(2, cores)}",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.CrawlLevelBench", cores.toString, rounds.toString, reps.toString,
      seeds.toString, roundMs.toString)
    val out = new StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val src = scala.io.Source.fromInputStream(proc.getInputStream)
    src.getLines().foreach { l => if (l.contains("[levelbench]")) out ++= l }
    proc.waitFor()
    val parts = out.toString.split("\\s+")
    if (parts.length >= 3) (parts(1).toDouble, parts(2).toDouble)
    else (-1.0, -1.0)
  }
}
