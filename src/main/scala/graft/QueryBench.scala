package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: run selected `SparkEntry.queries`
  * repeatedly inside ONE warm JVM/session and print per-rep seconds —
  * the only reliable way to compare two plan shapes on this VM, whose
  * run-to-run interference is bimodal (±25–40%). Not part of the
  * driver contract; `graft.Bench` remains the official protocol.
  *
  * Usage: runMain graft.QueryBench <sfDir> <reps> <name...>
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"best=${ts.min}%.2f")
    }
    spark.stop()
  }
}
