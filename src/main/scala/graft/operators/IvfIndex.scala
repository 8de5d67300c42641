package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF index — the build-once / probe-many production shape
  * of q36's inline training (a real similarity-search service trains
  * rarely and probes constantly; retraining per query, as the
  * oracle-checked q36 necessarily does, is the wrong amortization at
  * scale).
  *
  * `build` trains the same deterministic k-means as q36 (argmin
  * assignment via the native value-independent `IvfAssignExpr`, Lloyd
  * means as ONE hash aggregate of element-wise `VecSumAggregator`
  * partials per iteration) and then MATERIALIZES the index:
  *
  *  - `<indexDir>/cells`: (vec_id, v) parquet, `partitionBy("cid")` —
  *    the assignment cell is the PHYSICAL partition key, so a probe's
  *    nprobe-cell read prunes at the file-listing level and touches
  *    ~nprobe/k of the corpus bytes. That is the 100 TB path: the scan
  *    cost of a probe is independent of corpus size for fixed cell
  *    geometry (k grows like √n).
  *  - `<indexDir>/centroids`: k rows (cid, centroid) — broadcast-scale
  *    routing state.
  *
  * `probe` reads the k-row centroid table, picks the nprobe nearest
  * cells driver-side (same `d = c·c − 2 q·c` ordering as q36), and
  * exactly re-ranks only those partitions. PlanSpec asserts the scan's
  * partition filters actually prune.
  */
object IvfIndex {

  /** The native argmin assignment column for a trained centroid set
    * (cids 0..k−1; matrix is cid-ordered, so the array index IS the
    * cid). Shared with [[IvfPqIndex]]. */
  private[operators] def cidOf(v: org.apache.spark.sql.Column,
      cs: Seq[(Int, Seq[Double])]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.IvfAssignExpr(
      ColumnShim.expression(v), cs.sortBy(_._1).map(_._2.toArray).toArray))
  }

  /** q36's deterministic coarse training (evenly-spaced seeding, Lloyd
    * with one VecSumAggregator hash-agg per iteration, rounded means) —
    * extracted so [[IvfPqIndex.build]] trains the identical quantizer. */
  private[operators] def trainCentroids(spark: SparkSession, embDir: String,
      k: Int, iters: Int, roundDpDigits: Int): Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val n = emb.agg(count(lit(1))).head().getLong(0)
    require(n > 0, "empty embeddings table")
    val initVids = (0 until k).map(i => i.toLong * n / k)
    val vidVec = emb.filter($"vec_id".isin(initVids.distinct: _*))
      .as[(Long, Seq[Double])].collect().toMap
    var cents: Seq[(Int, Seq[Double])] = (0 until k).map(i => i -> vidVec(initVids(i)))
    def roundDp(x: Double): Double =
      BigDecimal(x).setScale(roundDpDigits, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecSum = udaf(new graft.functions.VecSumAggregator())
    (1 to iters).foreach { _ =>
      val means = emb.groupBy(cidOf($"v", cents).as("cid"))
        .agg(vecSum($"v").as("sv"), count(lit(1)).as("cnt"))
        .as[(Int, Seq[Double], Long)].collect()
        .map { case (cid, sv, cnt) => cid -> sv.map(x => roundDp(x / cnt)) }
        .toMap
      cents = cents.map { case (cid, cv) => cid -> means.getOrElse(cid, cv) }
    }
    cents
  }

  /** Train on `embDir`/embeddings.parquet and write the index. Returns
    * the trained centroids (cid → centroid). */
  def build(spark: SparkSession, embDir: String, indexDir: String,
      k: Int = 32, iters: Int = 2, roundDpDigits: Int = 6): Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    val cents = trainCentroids(spark, embDir, k, iters, roundDpDigits)
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))

    emb.select($"vec_id", $"v", cidOf($"v", cents).as("cid"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/cells")
    cents.toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    cents
  }

  /** Top-`topK` by exact cosine within the `nprobe` cells nearest the
    * query — a partition-pruned read of the materialized index. */
  def probe(spark: SparkSession, indexDir: String, qv: Seq[Double],
      nprobe: Int = 4, topK: Int = 10): DataFrame = {
    import spark.implicits._
    def sdot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .as[(Int, Seq[Double])].collect()
    val probeCids = cents
      .map { case (cid, cv) => (sdot(cv, cv) - 2.0 * sdot(qv, cv), cid) }
      .sorted.take(nprobe).map(_._2)
    spark.read.parquet(s"$indexDir/cells")
      .filter($"cid".isin(probeCids: _*)) // partition-column prune
      .select($"vec_id", VectorOps.cosine($"v", typedLit(qv)).as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(topK)
  }
}
