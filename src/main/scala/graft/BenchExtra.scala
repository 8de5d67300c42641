package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper (optimization guide §1): per-query timing
  * under the SAME action as the frozen Bench protocol v5
  * (`queryExecution.toRdd.foreach` — every output row materialized on
  * executors), run repeatedly inside ONE warm JVM so two plan shapes
  * can be compared on a VM whose run-to-run interference is bimodal
  * (±25–40%). The DataFrame construction (including any driver-side
  * training collects) is inside the timed region, exactly as in
  * `graft.Bench`. Optionally captures `.explain("formatted")` per
  * query. Not part of the driver contract; `graft.Bench` remains the
  * official protocol and is untouched.
  *
  * Usage: runMain graft.BenchExtra <sfDir> <reps> [name...|all]
  * env:
  *   SPARK_GRAFT_CPUS      — core count (default 32), master local[N]
  *   SPARK_GRAFT_PLAN_DIR  — if set, write <name>_<tag>.txt plan files
  *   SPARK_GRAFT_PLAN_TAG  — plan file suffix (default "before")
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names =
      if (args.length <= 2 || args(2) == "all") allNames else args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm the JVM
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    var firsts = 0.0
    var bests = 0.0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      planDir.foreach { d =>
        val p = java.nio.file.Paths.get(d, s"${name}_$planTag.txt")
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p,
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      }
      spark.sparkContext.setJobDescription(null)
      firsts += ts.head
      bests += ts.min
      println(f"[bx] $name%-24s ${ts.map(t => f"$t%.2f").mkString(",")} best=${ts.min}%.2f")
    }
    println(f"[bx] TOTAL first=$firsts%.2f best=$bests%.2f n=${names.size}")
    spark.stop()
  }
}
