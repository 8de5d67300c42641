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
/** Diagnostic listener (SPARK_GRAFT_STAGEMETRICS=1): per-stage executor
  * run vs cpu time — the gap is blocking (locks, I/O waits), which wall
  * clocks alone can't show. */
final class StageMetricsListener extends org.apache.spark.scheduler.SparkListener {
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val tm = si.taskMetrics
    if (tm != null && tm.executorRunTime > 200)
      println(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
        f"run=${tm.executorRunTime / 1000.0}%6.1fs cpu=${tm.executorCpuTime / 1e9}%6.1fs " +
        f"gc=${tm.jvmGCTime / 1000.0}%4.1fs " +
        f"shufWr=${tm.shuffleWriteMetrics.writeTime / 1e9}%4.1fs " +
        f"fetchWait=${tm.shuffleReadMetrics.fetchWaitTime / 1000.0}%4.1fs " +
        si.name.take(44))
  }
}

/** Always-on run-level totals, so every recorded bench rep carries its
  * own stage-metrics summary (the round-2 verdict's requirement: a
  * degraded driver run must be SELF-DIAGNOSING — cpu/run ≈ 1 with
  * inflated cpu means per-task/memory-system cost, run ≫ cpu means
  * blocking, low totals with high wall means driver idle). */
final class RunSummaryListener extends org.apache.spark.scheduler.SparkListener {
  private val runMs = new java.util.concurrent.atomic.AtomicLong
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong
  private val gcMs = new java.util.concurrent.atomic.AtomicLong
  private val shufWrNs = new java.util.concurrent.atomic.AtomicLong
  private val fetchWaitMs = new java.util.concurrent.atomic.AtomicLong
  private val nTasks = new java.util.concurrent.atomic.AtomicLong
  private val nStages = new java.util.concurrent.atomic.AtomicLong
  private var allocBase = -1L
  def reset(): Unit = {
    Seq(runMs, cpuNs, gcMs, shufWrNs, fetchWaitMs, nTasks,
      nStages).foreach(_.set(0L))
    allocBase = RunSummaryListener.jvmAllocatedBytes
  }
  /** JVM-wide heap allocated since reset, GB (−1 if unsupported).
    * Meaningful in local[N] mode where executors share this JVM; in
    * local-cluster mode it covers the driver only. The before/after
    * lever for the fetch/encode allocation-trim work. */
  def allocGb: Double = {
    val now = RunSummaryListener.jvmAllocatedBytes
    if (now < 0 || allocBase < 0) -1.0 else (now - allocBase) / 1e9
  }
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
    val tm = sc.stageInfo.taskMetrics
    if (tm != null) {
      runMs.addAndGet(tm.executorRunTime)
      cpuNs.addAndGet(tm.executorCpuTime)
      gcMs.addAndGet(tm.jvmGCTime)
      shufWrNs.addAndGet(tm.shuffleWriteMetrics.writeTime)
      fetchWaitMs.addAndGet(tm.shuffleReadMetrics.fetchWaitTime)
      nTasks.addAndGet(sc.stageInfo.numTasks.toLong)
      nStages.incrementAndGet()
    }
  }
  def json: String =
    f"""{"run_s":${runMs.get / 1000.0}%.1f,"cpu_s":${cpuNs.get / 1e9}%.1f,""" +
      f""""gc_s":${gcMs.get / 1000.0}%.1f,"shuf_wr_s":${shufWrNs.get / 1e9}%.1f,""" +
      f""""fetch_wait_s":${fetchWaitMs.get / 1000.0}%.1f,""" +
      f""""alloc_gb":$allocGb%.1f,""" +
      s""""tasks":${nTasks.get},"stages":${nStages.get}}"""
}

object RunSummaryListener {
  /** Total bytes allocated by all live threads (HotSpot
    * ThreadMXBean). Dead-thread allocation is lost, so treat deltas as
    * a lower bound — stable enough for before/after comparisons since
    * Spark's task/dispatcher pools live for the session. */
  def jvmAllocatedBytes: Long =
    java.lang.management.ManagementFactory.getThreadMXBean match {
      case t: com.sun.management.ThreadMXBean =>
        val ids = t.getAllThreadIds
        val per = t.getThreadAllocatedBytes(ids)
        var s = 0L
        var i = 0
        while (i < per.length) { if (per(i) > 0) s += per(i); i += 1 }
        s
      case _ => -1L
    }
}

object CrawlLevelBench {

  private[graft] def benchTmp: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
  }

  private[graft] def ExecCores: Int =
    sys.env.get("SPARK_GRAFT_EXEC_CORES").map(_.toInt).getOrElse(2)

  private[graft] def newSession(cores: Int): SparkSession = {
    // SPARK_GRAFT_CLUSTER=1: spin up a real multi-executor cluster
    // (local-cluster mode — one separate executor JVM per `ExecCores`
    // cores, netty shuffle between processes, own heap + GC per
    // executor), the honest sandbox proxy for BASELINE.json's "N and
    // 4N executors". Plain local[N] remains for unit-scale work.
    val cluster = sys.env.get("SPARK_GRAFT_CLUSTER").contains("1")
    val builder = SparkSession.builder()
      .appName(s"graft-bench-c$cores")
    if (cluster) {
      val execs = math.max(1, cores / ExecCores)
      val addOpens = jvmAddOpens.mkString(" ")
      // executors start in their own work dir — the classpath must be
      // absolute or app classes (and their serialized lambdas) vanish
      val absCp = System.getProperty("java.class.path")
        .split(java.io.File.pathSeparator)
        .map(p => java.nio.file.Paths.get(p).toAbsolutePath.toString)
        .mkString(java.io.File.pathSeparator)
      builder
        .master(s"local-cluster[$execs,$ExecCores,4096]")
        .config("spark.executor.memory", "3g")
        .config("spark.executor.extraClassPath", absCp)
        .config("spark.executor.extraJavaOptions",
          s"$addOpens -XX:+UseParallelGC -XX:ParallelGCThreads=$ExecCores")
    } else builder.master(s"local[$cores]")
    val s = builder
      // one wave: stage-metrics profiling showed per-task fixed costs
      // (writer init, codegen instances, task (de)serialization)
      // inflating total executor-seconds ~2x at 3 waves — fewer,
      // bigger tasks beat tail-smoothing here because the fetch stage
      // is rebalanced by url_hash anyway
      .config("spark.sql.shuffle.partitions", cores.toString)
      // AQE off for the bench loop: its per-stage driver re-planning is
      // pure serial overhead here (the loop's partition counts are
      // already tuned), measured at ~10% of c8 wall
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      // only explicit broadcast() hints broadcast: a borderline-sized
      // auto-broadcast is built single-threaded on the driver — a
      // serial, non-scaling step
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // A/B levers for the shuffle I/O path (round-6 verdict #3: the
      // one untested efficiency lever). Defaults = Spark defaults, so
      // the official protocol is unchanged unless the env is set.
      // Scope caveat: spark.io.compression.codec is NOT shuffle-only —
      // it also re-codecs broadcast vars, RDD persist, and spills, so
      // a codec delta is "I/O compression path", not shuffle-isolated
      // (the honest name; the buffer lever IS shuffle-scoped).
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC",
          sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_CODEC", "lz4")))
      .config("spark.shuffle.file.buffer",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BUFFER", "32k"))
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

  /** Lean-page variant of the same web: identical URL/link/frontier
    * structure, minimal span payload — isolates the frontier
    * scheduling machinery (window dequeue, dedup joins, bloom, state
    * commits), which is what the north-rule metric counts (URLs
    * scheduled+deduped/sec). */
  private[graft] def leanWeb = SyntheticWeb(
    nHosts = 8000, pagesPerHost = 600, megaFactor = 12,
    spanBase = 2, spanRange = 4, wordBase = 3, wordRange = 4)

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

  /** warmup (JIT + codegen) then best-of-`reps` measured runs. The
    * returned stats JSON is the summary of the best rep's stages. */
  private[graft] def benchAt(spark: SparkSession, rounds: Int, reps: Int,
      seeds: Int, roundMs: Long, lean: Boolean,
      summary: RunSummaryListener): (Double, Double, String) = {
    val warmWeb = SyntheticWeb(nHosts = 400, pagesPerHost = 80, megaFactor = 4,
      spanBase = if (lean) 2 else 40, spanRange = if (lean) 4 else 30,
      wordBase = if (lean) 3 else 8, wordRange = if (lean) 4 else 10)
    // SPARK_GRAFT_SEEN_FILTER=cuckoo benches the alternative seen
    // sketch on the identical protocol (A/B lever; default bloom keeps
    // round-over-round comparability)
    val seen = sys.env.getOrElse("SPARK_GRAFT_SEEN_FILTER", "bloom")
    // warmup must use the SAME config knobs that shape codegen/plans
    // (packedSpans schema, retention) so the measured rounds hit the
    // generated-code cache instead of recompiling per stage
    runCrawl(spark, warmWeb,
      CrawlConfig(numBuckets = 64, roundMs = 5000L, maxRounds = 2,
        retainSnapshots = Some(2), packedSpans = true, seenFilter = seen),
      seeds = 20000)
    (1 to reps).map { _ =>
      summary.reset()
      val (tput, wall) = runCrawl(spark, if (lean) leanWeb else measuredWeb,
        CrawlConfig(numBuckets = 64, roundMs = roundMs, maxRounds = rounds,
          retainSnapshots = Some(2), packedSpans = true, seenFilter = seen),
        seeds = seeds)
      (tput, wall, summary.json)
    }.maxBy(_._1)
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rounds = args(1).toInt
    val reps = args(2).toInt
    val seeds = if (args.length > 3) args(3).toInt else 300000
    val roundMs = if (args.length > 4) args(4).toLong else 50000L
    val lean = args.length > 5 && args(5) == "lean"
    val spark = newSession(cores)
    if (sys.env.get("SPARK_GRAFT_STAGEMETRICS").contains("1"))
      spark.sparkContext.addSparkListener(new StageMetricsListener)
    val summary = new RunSummaryListener
    spark.sparkContext.addSparkListener(summary)
    val (tput, wall, stats) = benchAt(spark, rounds, reps, seeds, roundMs,
      lean, summary)
    spark.stop()
    println(s"[levelstats] $stats")
    println(f"[levelbench] $tput%.1f $wall%.2f")
  }

  private[graft] def jvmAddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  /** One spawned bench rep: throughput, measured wall, and the rep's
    * stage-metrics summary JSON (self-diagnosing record). */
  final case class Rep(tput: Double, wall: Double, stats: String)

  /** Spawn a fresh driver JVM for `cores`. In `cluster` mode the JVM is
    * a thin driver (executors are separate per-2-core JVMs spawned by
    * local-cluster with 3g each); otherwise a local[cores] JVM with
    * proportional GC threads. Returns (tput, wall). */
  def spawn(cores: Int, rounds: Int, reps: Int, heapGb: Int,
      seeds: Int = 300000, roundMs: Long = 50000L,
      lean: Boolean = false, cluster: Boolean = false): (Double, Double) = {
    val r = spawnRep(cores, rounds, reps, heapGb, seeds, roundMs, lean, cluster)
    (r.tput, r.wall)
  }

  /** spawn() with the per-rep stage summary attached. */
  def spawnRep(cores: Int, rounds: Int, reps: Int, heapGb: Int,
      seeds: Int = 300000, roundMs: Long = 50000L,
      lean: Boolean = false, cluster: Boolean = false): Rep = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val addOpens = jvmAddOpens.flatMap(s => {
      val Array(k, v) = s.stripPrefix("--add-opens=").split("=")
      Seq("--add-opens", s"$k=$v")
    })
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      s"-Xmx${heapGb}g",
      "-XX:+UseParallelGC",
      s"-XX:ParallelGCThreads=${math.max(2, if (cluster) 2 else cores)}",
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.CrawlLevelBench", cores.toString, rounds.toString, reps.toString,
      seeds.toString, roundMs.toString, if (lean) "lean" else "rich")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    if (cluster) {
      pb.environment().put("SPARK_GRAFT_CLUSTER", "1")
      // the standalone launcher needs these to assemble executor JVMs
      pb.environment().put("SPARK_HOME",
        sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
      pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    }
    val out = new StringBuilder
    val stats = new StringBuilder
    val proc = pb.start()
    val src = scala.io.Source.fromInputStream(proc.getInputStream)
    src.getLines().foreach { l =>
      if (l.contains("[levelbench]")) out ++= l
      else if (l.contains("[levelstats]")) {
        stats.clear()
        stats ++= l.substring(l.indexOf("[levelstats]") + "[levelstats]".length).trim
      }
    }
    proc.waitFor()
    val parts = out.toString.split("\\s+")
    val statsJson = if (stats.nonEmpty) stats.toString else "null"
    if (parts.length >= 3) Rep(parts(1).toDouble, parts(2).toDouble, statsJson)
    else Rep(-1.0, -1.0, statsJson)
  }
}
