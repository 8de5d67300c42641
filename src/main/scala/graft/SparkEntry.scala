package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator coverage surface (one entry per
  * implemented operator from SURVEY.md §2 plus the training-data
  * pipeline operators); `oracleSql` carries the DuckDB-equivalent SQL
  * for every SQL-expressible entry. Column names and value types are
  * aligned pairwise (the driver hash-compares after sorting columns by
  * name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0: the crawl engine's per-host priority dequeue (W1)
    * expressed over the neutral corpus. */
  def entry(spark: SparkSession): DataFrame =
    CrawlQueries.queries("q17_host_dequeue")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CrawlQueries.queries ++ TextOps.queries ++
      VectorOps.queries ++ MultimodalOps.queries ++ PipelineOps.queries ++
      InterleavedOps.queries ++ RetrievalOps.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Every query has an oracle —
    * q27/q28/q31 gained portable SQL formulations in round 2; the
    * curation ops q40–q45 (round 3), the cleaning/multimodal ops
    * q46–q49 (round 4), the pipeline ops q50–q57 (round 5), and the
    * packing/interleaved/retrieval/mixing/funnel ops q58–q69 (round 6)
    * shipped with theirs, as did the round-7 ops: q70 SimHash
    * near-dup detection, q71 document-atomic interleaved packing
    * (recursive-CTE oracle twin), q72 leakage-safe cluster-aware
    * split assignment, q73 exact-substring removal (per-doc
    * rebuilt-text fingerprints), q74 BPE merge induction, q75
    * product-quantization codes, q76 IVF-PQ ADC serving. Round 7 also
    * flattened the q58/q61 gate
    * outputs to scalar rows (one row per segment/span, DuckDB unnest
    * twins) — the driver's hash compare requires scalar cells.
    * Round 8: q77 iterative BPE training (apply-top-merge-and-recount,
    * unrolled chained-CTE oracle). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CrawlQueries.oracles ++ TextOps.oracles ++
      VectorOps.oracles ++ MultimodalOps.oracles ++ PipelineOps.oracles ++
      InterleavedOps.oracles ++ RetrievalOps.oracles
}
