package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.core.{CrawlConfig, SyntheticWeb}
import graft.engine.CrawlEngine

/** A/B/A/B scaling experiment: same crawl at alternating parallelism
  * levels in one JVM, to separate genuine scaling from order effects
  * (JIT, page cache). Not part of the driver contract — a measurement
  * tool for BENCH/BASELINE.md. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args(0).split(",").map(_.toInt).toSeq
      else Seq(8, 32, 8, 32)
    val web = SyntheticWeb(nHosts = 8000, pagesPerHost = 600, megaFactor = 12,
      spanBase = 40, spanRange = 30, wordBase = 8, wordRange = 10)
    val cfg = CrawlConfig(numBuckets = 64, roundMs = 100000L, maxRounds = 2)
    levels.zipWithIndex.foreach { case (cores, i) =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"probe-c$cores-$i")
        .config("spark.sql.shuffle.partitions", (cores * 3).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val dir = Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe").toString
      val eng = new CrawlEngine(spark, web, cfg, dir)
      eng.init(web.seedUrls(600000))
      val t0 = System.nanoTime()
      val stats = eng.run()
      val secs = (System.nanoTime() - t0) / 1e9
      val scheduled = stats.map(_.admitted).sum + stats.map(_.enqueued).sum
      println(f"[probe] run=$i cores=$cores wall=$secs%.1f tput=${scheduled / secs}%.0f urls/s")
      import scala.jdk.CollectionConverters._
      Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala.toSeq
        .reverse.foreach(Files.deleteIfExists(_))
      spark.stop()
    }
  }
}
