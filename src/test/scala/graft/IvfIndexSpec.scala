package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

/** The persisted IVF index: same training as q36, materialized cells
  * partitioned by cid, probes partition-pruned and answer-equal to the
  * inline q36 query. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  test("build+probe equals the inline q36 answer; probe scan is partition-pruned") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(spark, dir, idx) // q36 defaults: k=32, 2 iters, 6dp
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()

    val probed = IvfIndex.probe(spark, idx, qv, nprobe = 4, topK = 10)
    val got = probed.as[(Long, Double)].collect().toSeq
    val expect = SparkEntry.queries("q36_ann_ivf")(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(got === expect, "probe answer diverged from inline q36")

    // the cells scan must prune on the cid partition column
    val plan = probed.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("cid"), s"no cid partition filter:\n$scanLine")
    // and the executed scan actually read only the probed cells' files
    // (inputFiles is pre-pruning metadata, so read the scan's metric)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val allCells = spark.read.parquet(s"$idx/cells").inputFiles.length
    probed.collect() // drive THIS dataset's plan so its metrics populate
    val scan = scans(probed.queryExecution.executedPlan)
      .find(_.toString.contains("PartitionFilters"))
      .getOrElse(fail("no file scan with partition filters found"))
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < allCells,
      s"probe read $readFiles of $allCells files — no pruning")
  }

  test("probing all cells recovers the exact brute-force top-10") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-ivf2").toString
    IvfIndex.build(spark, dir, idx, k = 8, iters = 1)
    val qv = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" === 7)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    // same left-to-right fold as the probe's cosine
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    val exact = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .select($"vec_id", cos($"v", typedLit(qv)).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(10)
      .as[(Long, Double)].collect().toSeq
    val full = IvfIndex.probe(spark, idx, qv, nprobe = 8, topK = 10)
      .as[(Long, Double)].collect().toSeq
    assert(full === exact, "nprobe=k must equal brute force")
  }
}
