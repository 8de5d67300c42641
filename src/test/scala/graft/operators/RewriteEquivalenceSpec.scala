package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-9 optimization rewrites, pinned equivalent to the shapes they
  * replaced (the oracle compare guards the end results; these lock the
  * INTERNALS so a future edit can't silently drift the fused forms
  * from their reference algorithms).
  */
class RewriteEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("q73 fused scrub (one shingle pass) == legacy two-pass directory + scrub") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    val fused = RetrievalOps.scrubCorpus(docs)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val legacy = RetrievalOps.scrubAgainst(docs,
        RetrievalOps.dupShingleDirectory(spark, dir))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(fused.nonEmpty && fused.exists(_._3 > 0), "fixture has no removals")
    assert(fused === legacy)
  }

  test("fused per-iteration PQ training == block-by-block sequential Lloyd") {
    import spark.implicits._
    val fused = VectorOps.pqCodebooks(spark, dir)
    // the pre-round-9 reference: each block trains alone, one aggregate
    // job per (block, iteration)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val n = emb.agg(count(lit(1))).head().getLong(0)
    val initVids = (0 until VectorOps.PqK).map(i => i.toLong * n / VectorOps.PqK)
    val vidVec = emb.filter($"vec_id".isin(initVids.distinct: _*))
      .as[(Long, Seq[Double])].collect().toMap
    def roundDp(x: Double): Double =
      BigDecimal(x).setScale(VectorOps.IvfRoundDp, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val vecSum = udaf(new graft.functions.VecSumAggregator())
    val reference = (0 until VectorOps.PqM).map { b =>
      val sub = VectorOps.PqSub
      val vb = emb.select($"vec_id", expr(s"slice(v, ${b * sub + 1}, $sub)").as("v"))
      var cents: Seq[(Int, Seq[Double])] = (0 until VectorOps.PqK).map(i =>
        i -> vidVec(initVids(i)).slice(b * sub, (b + 1) * sub))
      (1 to VectorOps.IvfIters).foreach { _ =>
        val sums = vb.groupBy(VectorOps.pqAssign($"v", cents).as("cid"))
          .agg(vecSum($"v").as("sv"), count(lit(1)).as("cnt"))
          .as[(Int, Seq[Double], Long)].collect()
        val means = sums.map { case (cid, sv, cnt) =>
          cid -> sv.map(x => roundDp(x / cnt))
        }.toMap
        cents = cents.map { case (cid, cv) => cid -> means.getOrElse(cid, cv) }
      }
      cents
    }
    assert(fused === reference)
  }

  test("q57/q60 shared hit set aggregates both ways consistently") {
    import spark.implicits._
    val uncachedByBvec = VectorOps.decontamHitsUncached(spark, dir)
      .groupBy($"bvec").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // q60's output restricted to leaked rows must equal the uncached
    // aggregation (the consumer plan reads the cached checkpoint)
    val q60 = graft.SparkEntry.queries("q60_benchmark_leakage")(spark, dir)
      .filter($"leaked")
      .select($"bvec", $"n_corpus_hits")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(q60 === uncachedByBvec)
    assert(q60.nonEmpty, "fixture has no leakage")
  }
}
