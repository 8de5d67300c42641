package graft.operators

import org.apache.spark.sql.DataFrame

/** Degenerate-scan widener — optimization guide §2.5, "input skew: one
  * huge unsplittable file … otherwise repartition immediately after
  * the read".
  *
  * The sandbox tables are single-file parquet with ONE row group, and
  * a row group is parquet's unit of scan parallelism: whatever the
  * split configuration, only the task whose byte range contains the
  * row group's midpoint produces rows, so every scan stage runs as ONE
  * non-empty task. All per-row work fused into the scan stage — md5
  * shingles, trigram explodes, span lambdas, decimal casts — therefore
  * serializes on one core of local[32] (measured: q1's 600k-row
  * lineitem aggregate 1.18 s best-rep with 31 cores idle).
  *
  * `widen` buys the stage width back with one round-robin exchange of
  * the projected input, applied ONLY when the source's natural scan
  * parallelism is below the session's core count. On a real multi-file
  * warehouse table the partition count already exceeds the core count
  * and this is a NO-OP — the plan is unchanged — so the helper never
  * trades the 100 TB shape for a local win. Call it on an
  * already-projected frame (`read.select(cols)`), so the exchange
  * carries only the columns the query uses and the scan's ReadSchema
  * pruning is unaffected (filters still push through the repartition
  * to the scan: PushDownPredicates handles Repartition).
  *
  * Results are invariant under the re-partitioning: the suite's
  * aggregates are engineered order-free (decimal / integer / micro-nat
  * sums, exact percentile, HLL register merge — see the operator-file
  * headers), and every window / top-k carries a total order.
  */
object Scans {
  import org.apache.spark.sql.functions.{col, lit, pmod, struct, xxhash64}

  def widen(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) {
      // Deterministic hash exchange, NOT keyless round-robin: a keyless
      // repartition(n) first pays a local sort of its entire input in
      // the (single-task) scan stage — spark.sql.execution.
      // sortBeforeRepartition, on by default since SPARK-23207 so that
      // retried tasks reproduce the same row-to-partition assignment
      // (guide §2.5). Hashing the full row through xxhash64 gives the
      // same retry-determinism with no sort (the guide's own
      // "derive the synthetic key deterministically, e.g.
      // pmod(xxhash64(id), 100 * n)" shape); cores*64 distinct key
      // values spread evenly over `cores` partitions. Same-phase A/B
      // at sf0.1 (BenchExtra, 20 widened-path queries, back-to-back):
      // best-of-3 13.31 s -> 12.18 s, first-run 27.37 -> 25.08 s
      // (q1 1.14->0.77, q27 0.80->0.67, q25 1.50->1.29, q73 1.25->1.19).
      df.repartition(cores, pmod(xxhash64(struct(df.columns.map(col): _*)),
        lit(cores * 64)))
    } else df
  }
}
