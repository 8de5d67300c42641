package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{BenchmarkStore, VectorOps}

/** The persisted benchmark store for semantic decontamination (q57):
  * a store-routed run is row-identical to the in-query derivation,
  * the benchmark side is genuinely served from the store (the plan
  * scans the store path; the embeddings table is scanned only for the
  * corpus side), and detach restores the in-query path. */
class BenchmarkStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.01"

  private def q57() =
    VectorOps.queries("q57_semantic_decontam")(spark, dir)

  test("store-routed q57 is row-identical to the in-query benchmark side; " +
    "the plan serves the benchmark from the store") {
    import spark.implicits._
    BenchmarkStore.detach(dir) // hygiene: no leakage between tests
    val fresh = q57().as[(Long, Long, Boolean)].collect().toSeq
    assert(fresh.nonEmpty && fresh.exists(_._3), "fixture has no contamination")

    val store = Files.createTempDirectory("graft-benchstore").toString
    BenchmarkStore.build(spark, dir, store)
    BenchmarkStore.attach(dir, store, snapshot = "bench-v1")
    try {
      val routed = q57().as[(Long, Long, Boolean)].collect().toSeq
      assert(routed === fresh, "store-routed result differs from in-query")
      assert(BenchmarkStore.snapshotOf(dir) === Some("bench-v1"))

      // plan audit — on the UNCACHED builder since round 9: the q57/
      // q60 consumer plans aggregate the session-cached checkpointed
      // pair set (the dsirWeightFrame precedent), so the store-routing
      // contract lives on the builder plan. The benchmark side reads
      // the store parquet (both tables), and the embeddings file is
      // scanned exactly as many times as the CORPUS side needs it
      // (bands + re-rank = 2) — with no store attached the benchmark
      // side adds two more embeddings scans
      def embScans(plan: String): Int =
        plan.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("embeddings.parquet"))
      val routedPlan = VectorOps.decontamHitsUncached(spark, dir)
        .queryExecution.executedPlan.toString
      assert(routedPlan.contains("bench_bands"), "band table not store-served")
      assert(routedPlan.contains("bench_vectors"), "vector table not store-served")
      assert(embScans(routedPlan) === 2,
        s"expected 2 corpus-side embeddings scans, plan:\n$routedPlan")
    } finally BenchmarkStore.detach(dir)

    // detached: back to the in-query path, same rows, no store scan
    val detachedPlan = VectorOps.decontamHitsUncached(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!detachedPlan.contains("bench_bands"))
    assert(q57().as[(Long, Long, Boolean)].collect().toSeq === fresh)
  }

  test("stored tables carry the exact benchmark split") {
    import spark.implicits._
    val store = Files.createTempDirectory("graft-benchstore2").toString
    BenchmarkStore.build(spark, dir, store)
    val benchIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" % 19 === 0).select($"vec_id").as[Long].collect().toSet
    val vecIds = BenchmarkStore.vectors(spark, store)
      .select($"bvec").as[Long].collect().toSet
    assert(vecIds === benchIds)
    // 4 band rows per benchmark vector
    assert(BenchmarkStore.bands(spark, store).count() === benchIds.size * 4L)
  }
}
