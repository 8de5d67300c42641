package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF-PQ index (round-7 verdict #4) — the build-once /
  * serve-many form of q75+q76: q76's inline gate necessarily retrains
  * the PQ codebooks and re-encodes the corpus per call (the oracle
  * contract), which is the wrong amortization for a serving path. Here
  * the codebooks, the coarse IVF assignment, AND the integer codes are
  * materialized once per corpus refresh; a query reads k×M doubles of
  * routing/codebook state plus the code columns of its probed cells.
  *
  * Layout (Jégou, Douze & Schmid, TPAMI 2011 — the inverted-file +
  * product-quantization organization):
  *  - `<indexDir>/cells`: (vec_id, code_0..code_{M−1}, v) parquet,
  *    `partitionBy("cid")` — the coarse cell is the physical partition
  *    key, so a probe prunes at file-listing level; the ADC pass
  *    projects ONLY (vec_id, code_*) — 2 bytes of code per vector read
  *    instead of the 64-dim float vector (the "codes stream, floats
  *    never shuffle" property, now true at the STORAGE layer too).
  *  - `<indexDir>/codebooks`: (block, cid, centroid) — M×k rows.
  *  - `<indexDir>/centroids`: (cid, centroid) — k rows of coarse
  *    routing state.
  *
  * `probe` = ADC serving: LUTs from the persisted codebooks
  * (driver-side, k×M doubles of query state), lookup-sum over the
  * probed cells' code columns into a TakeOrderedAndProject
  * ([[VectorOps.AdcCandidates]]), then an exact cosine re-rank that
  * point-fetches ONLY the candidate vectors. With nprobe = k this is
  * answer-equal to the inline q76 (same codebooks, same LUT arithmetic,
  * same tie order) — asserted in IvfPqIndexSpec. */
object IvfPqIndex {

  import VectorOps.{PqM, PqSub, AdcCandidates}

  /** Train coarse quantizer + PQ codebooks and materialize the index. */
  def build(spark: SparkSession, embDir: String, indexDir: String,
      k: Int = VectorOps.IvfK, iters: Int = VectorOps.IvfIters): Unit = {
    import spark.implicits._
    val cents = IvfIndex.trainCentroids(spark, embDir, k, iters,
      VectorOps.IvfRoundDp)
    val books = VectorOps.pqCodebooks(spark, embDir)
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val codeCols = (0 until PqM).map(b =>
      VectorOps.pqAssign(expr(s"slice(v, ${b * PqSub + 1}, $PqSub)"), books(b))
        .cast("long").as(s"code_$b"))
    emb.select(($"vec_id" +: codeCols :+ $"v" :+
        IvfIndex.cidOf($"v", cents).as("cid")): _*)
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexDir/cells")
    books.zipWithIndex
      .flatMap { case (cb, b) => cb.map { case (cid, cv) => (b, cid, cv) } }
      .toDF("block", "cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebooks")
    cents.toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Encode one micro-batch of NEW embeddings under the index's
    * FROZEN routing state (persisted centroids + codebooks — no
    * retraining: a drifting ingest encodes under the index version it
    * lands in, the IVF-PQ add() semantics) and append it as the
    * exactly-once `batch=<id>/` partition of `<indexDir>/cells_delta`.
    * The delta is the LSM-style side table: probes read base ∪ delta
    * until the next full rebuild folds it in. Same columns as the
    * base cells; state read per batch = k + M×k centroid rows. */
  def encodeBatch(batch: DataFrame, batchId: Long, indexDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .as[(Int, Seq[Double])].collect()
    val books: Seq[Seq[(Int, Seq[Double])]] =
      spark.read.parquet(s"$indexDir/codebooks")
        .as[(Int, Int, Seq[Double])].collect()
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.map(r => (r._2, r._3)).sortBy(_._1).toSeq)
    val emb = batch.select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val codeCols = (0 until PqM).map(b =>
      VectorOps.pqAssign(expr(s"slice(v, ${b * PqSub + 1}, $PqSub)"), books(b))
        .cast("long").as(s"code_$b"))
    graft.store.PersistedStore.writeBatch(
      emb.select(($"vec_id" +: codeCols :+ $"v" :+
        IvfIndex.cidOf($"v", cents).as("cid")): _*),
      s"$indexDir/cells_delta", batchId)
  }

  /** Fold the streamed `cells_delta` into the base partitioned
    * layout — the maintenance rewrite that bounds the delta between
    * full rebuilds (the IceLite compactRetired analog). Only the
    * cid partitions the delta touches are rewritten (dynamic
    * partition overwrite — each partition flip is a commit-level
    * rename), then the delta directory is dropped. Crash between the
    * two steps leaves already-folded rows duplicated in base ∪ delta:
    * the fold dedups on vec_id so RE-RUNNING is idempotent, and
    * [[probe]]'s re-rank dedups its bounded candidate fetch so the
    * window is harmless to serving. */
  def compactDelta(spark: SparkSession, indexDir: String): Unit = {
    val deltaPath = new org.apache.hadoop.fs.Path(s"$indexDir/cells_delta")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$indexDir/cells_fold_tmp")
    val fs = deltaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crash after the delta drop can strand a previous fold's tmp
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    if (!fs.exists(deltaPath)) return
    val delta = graft.store.PersistedStore
      .readTable(spark, s"$indexDir/cells_delta")
    val cids = delta.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (cids.nonEmpty) {
      val base = spark.read.parquet(s"$indexDir/cells")
      // stage the combined rows OUT of the source tree first — a
      // direct overwrite would read and rewrite the same files
      base.filter(col("cid").isin(cids: _*))
        .unionByName(delta.select(base.columns.map(col): _*))
        .dropDuplicates("vec_id")
        .write.mode("overwrite").parquet(tmpPath.toString)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try spark.read.parquet(tmpPath.toString)
        .write.mode("overwrite").partitionBy("cid")
        .parquet(s"$indexDir/cells")
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    fs.delete(deltaPath, true)
    fs.delete(tmpPath, true)
  }

  private def deltaExists(spark: SparkSession, indexDir: String): Boolean = {
    val deltaPath = new org.apache.hadoop.fs.Path(s"$indexDir/cells_delta")
    val fs = deltaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(deltaPath)
  }

  /** The serving row set: base cells ∪ streamed delta (if any). The
    * base prunes at partition level on `cid`; the delta — small
    * between rebuilds — filters on its `cid` column. */
  private def cellsWithDelta(spark: SparkSession, indexDir: String): DataFrame = {
    val base = spark.read.parquet(s"$indexDir/cells")
    if (!deltaExists(spark, indexDir)) base
    else base.unionByName(
      graft.store.PersistedStore.readTable(spark, s"$indexDir/cells_delta")
        .select(base.columns.map(col): _*))
  }

  private def sdot(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** ADC-serve the query from the persisted index: top-`topK` by exact
    * cosine among the top-[[VectorOps.AdcCandidates]] ADC candidates of
    * the `nprobe` cells nearest `qv`. */
  def probe(spark: SparkSession, indexDir: String, qv: Seq[Double],
      nprobe: Int = VectorOps.IvfProbes, topK: Int = 10): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexDir/centroids")
      .as[(Int, Seq[Double])].collect()
    val books: Map[Int, Seq[(Int, Seq[Double])]] =
      spark.read.parquet(s"$indexDir/codebooks")
        .as[(Int, Int, Seq[Double])].collect()
        .groupBy(_._1).map { case (b, rows) =>
          b -> rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq
        }
    val probeCids = cents
      .map { case (cid, cv) => (sdot(cv, cv) - 2.0 * sdot(qv, cv), cid) }
      .sorted.take(nprobe).map(_._2)
    // query LUTs: lut[b][c] = c·c − 2 q_b·c — the q76 arithmetic, from
    // the PERSISTED codebooks
    val luts: Seq[Seq[Double]] = (0 until PqM).map { b =>
      val qb = qv.slice(b * PqSub, (b + 1) * PqSub)
      books(b).map { case (_, cv) => sdot(cv, cv) - 2.0 * sdot(qb, cv) }
    }
    val cells = cellsWithDelta(spark, indexDir)
      .filter(col("cid").isin(probeCids: _*)) // partition prune (base)
    // ADC pass: code columns only — the scan's ReadSchema must not
    // carry the float vectors (asserted in the spec)
    val adc = (0 until PqM).map { b =>
      element_at(typedLit(luts(b)), col(s"code_$b").cast("int") + 1)
    }.reduce(_ + _)
    // with a delta present, dedup at vec_id level BEFORE the bounded
    // candidate cut (round-8 ADVICE): in the compactDelta crash window
    // a folded row transiently exists in base AND delta, and duplicate
    // rows inside the top-AdcCandidates window would consume slots and
    // evict distinct vectors from the re-rank set — a transient recall
    // loss the final-fetch dedup alone cannot undo. Identical rows
    // carry identical codes, so min(adc) per vec_id is exact. The
    // base-only path is untouched (no extra aggregate in the plan).
    val adcRows = cells.select(col("vec_id"), adc.as("adc"))
    val adcDeduped =
      if (deltaExists(spark, indexDir))
        adcRows.groupBy(col("vec_id")).agg(min(col("adc")).as("adc"))
      else adcRows
    val candIds = adcDeduped
      .orderBy(col("adc"), col("vec_id")).limit(AdcCandidates)
      .select(col("vec_id")).as[Long].collect().toSeq
    // exact re-rank: point-fetch ONLY the candidate vectors (bounded —
    // AdcCandidates rows — row-group pruned by the vec_id stats). With
    // a delta present, a dedup guards the compactDelta crash window
    // (a folded row can transiently exist in base AND delta); the
    // base-only path keeps the exchange-free fetch plan
    val fetched = cells.filter(col("vec_id").isin(candIds: _*))
    (if (deltaExists(spark, indexDir)) fetched.dropDuplicates("vec_id")
     else fetched)
      .select(col("vec_id"), VectorOps.cosine(col("v"), typedLit(qv)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(topK)
  }
}
