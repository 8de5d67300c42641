package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core._
import graft.icelite.IceLite

/** Spark-native BSP crawl engine (SURVEY.md §3.2).
  *
  * Replaces node-crawler's event-loop scheduling [PK:high, SURVEY.md
  * §3.1] with a deterministic bulk-synchronous round loop over IceLite
  * snapshots: each round reads frontier snapshot s_r, admits under
  * per-host politeness quotas, "fetches" + extracts spans, discovers
  * links, and atomically commits snapshot s_{r+1} (checkpoint/resume =
  * restart from the last committed snapshot, BASELINE.json:14).
  *
  * Scale design (the sandbox runs local[32]; the plan is sized for a
  * 10^10-URL frontier on a 1000-executor cluster):
  *  - frontier hash-partitioned by `host_bucket` = pmod(xxhash64(host),
  *    numBuckets) so per-host politeness decisions co-locate;
  *  - the per-host priority dequeue is a two-phase top-K window:
  *    phase 1 ranks within (host, salt) — explicit salting so a
  *    mega-host's pending rows spread over `saltFanout` tasks — and
  *    phase 2 re-merges the ≤ salt×quota survivors per host
  *    (SURVEY.md §4: AQE cannot fix Window skew, salting must be
  *    explicit); this preserves exact per-host ordering because a
  *    global top-q row is a top-q row of its salt bucket;
  *  - the global per-round cap is orderBy(total order).limit(k) which
  *    Spark executes as TakeOrderedAndProject (per-partition top-k +
  *    driver merge — no global sort shuffle);
  *  - the seen set IS the frontier key set (every discovered URL gets a
  *    frontier row in state pending/done/dropped), so dedup is one
  *    left_anti join on url_hash, prefiltered by per-bucket bloom
  *    sketches so definitely-new URLs skip the join entirely;
  *  - all ordering keys form a total order (priority, discovered_seq,
  *    url_hash) with parallelism-invariant discovered_seq, so results
  *    are invariant to the number of partitions/cores (property-tested).
  */
final class CrawlEngine(
    val spark: SparkSession,
    val web: SyntheticWeb,
    val cfg: CrawlConfig,
    rootDir: String,
    saltFanout: Int = 8) extends Serializable {

  import spark.implicits._

  val ice = new IceLite(rootDir)

  import CrawlEngine.{Attempt, LinkCand}

  private val FRONTIER = "frontier"
  private val ATTEMPTS = "attempts"
  private val LINEAGE = "lineage"
  private val BLOOM = "bloom"

  // ---- initialization ------------------------------------------------

  /** Seed the frontier (round 0). Seeds get priority 5 and
    * discovered_seq = position in the seed list (FIXTURES.md A3). */
  def init(seeds: Seq[String]): Unit = {
    val w = web; val c = cfg
    val entries = seeds.zipWithIndex.flatMap { case (u, i) =>
      CrawlEngine.toEntry(w, u, 5, i.toLong, due = 0L, c)
    }.groupBy(_.url_hash).map { case (_, g) => g.minBy(_.discovered_seq) }.toSeq
    val df = spark.createDataset(entries).toDF()
      .repartition(cfg.numBuckets, $"host_bucket")
    ice.writeCommit(df, FRONTIER, "seed", append = false,
      props = Map("round" -> "0"), partitionCols = Seq("state"))
    // bloom over seed hashes
    val blobs = buildBloomDeltas(spark.createDataset(entries.map(e =>
      (e.host_bucket, e.url_hash))).toDF("host_bucket", "url_hash"))
    commitBloom(mergeBloom(Map.empty, blobs.map { case (b, (_, bits)) => b -> bits }))
  }

  def nextRound: Long = ice.props(FRONTIER).getOrElse("round", "0").toLong

  // ---- the round loop ------------------------------------------------

  final case class RoundStats(round: Long, candidates: Long, admitted: Long,
      fetchedOk: Long, failed: Long, discovered: Long, enqueued: Long)

  /** Run until drain or `maxRounds` total rounds. Returns per-round
    * stats. Resumable: picks up from the last committed snapshot. */
  def run(): Seq[RoundStats] = {
    val stats = Seq.newBuilder[RoundStats]
    var r = nextRound
    var draining = false
    while (r < cfg.maxRounds && !draining) {
      val s = runRound(r)
      stats += s
      r += 1
      if (s.admitted == 0 && s.enqueued == 0) {
        // drain probe: any pending left (e.g., retries due later)?
        draining = frontier().filter($"state" === FrontierEntry.Pending)
          .limit(1).count() == 0
      }
    }
    stats.result()
  }

  def frontier(snapshotId: Option[Long] = None): DataFrame =
    ice.read(spark, FRONTIER, snapshotId).getOrElse(spark.emptyDataset[FrontierEntry].toDF())

  /** The canonical interleaved documents table — a pruned projection
    * of the attempts fact table (parquet reads only doc_id + spans).
    * With packedSpans the stored binary cell is unpacked back to the
    * normative array<struct> schema here (byte-equal by codec). */
  def documents(): DataFrame =
    ice.read(spark, ATTEMPTS)
      .map { df =>
        import org.apache.spark.sql.graftshim.ColumnShim
        import org.apache.spark.sql.types.BinaryType
        val spansCol =
          if (df.schema("spans").dataType == BinaryType)
            ColumnShim.column(graft.functions.UnpackSpansExpr(
              ColumnShim.expression($"spans"))).as("spans")
          else $"spans"
        df.filter($"has_doc").select($"url_canon".as("doc_id"), spansCol)
      }
      .getOrElse(spark.emptyDataset[Doc].toDF())

  /** Crawl order — a slim projection of the attempts fact table,
    * totally ordered by (round, priority, discovered_seq, url_hash). */
  def crawlLog(): DataFrame =
    ice.read(spark, ATTEMPTS)
      .map(_.select($"round", $"priority", $"discovered_seq", $"url_hash",
        $"url_canon", $"retry_count")
        .orderBy($"round", $"priority", $"discovered_seq", $"url_hash"))
      .getOrElse(spark.emptyDataFrame)

  def lineage(): DataFrame =
    ice.read(spark, LINEAGE).getOrElse(spark.emptyDataFrame)

  private val timing = sys.env.get("SPARK_GRAFT_TIMING").contains("1")
  private def timed[T](label: String, r: Long)(f: => T): T = {
    if (!timing) f else {
      val t0 = System.nanoTime()
      val out = f
      println(f"[timing] r=$r $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      out
    }
  }

  def runRound(r: Long): RoundStats = {
    val w = web; val c = cfg
    val front = frontier()
      val cands = front.filter($"state" === FrontierEntry.Pending && $"due_round" <= r)

      // J3: politeness quota via broadcast join on the (small) host dim.
      val hosts = cands.select($"host").distinct().as[String]
        .map(h => (h, w.policy(h).quota(c.roundMs))).toDF("host", "quota")
      val joined = cands.join(broadcast(hosts), "host")

      // W1: per-host priority dequeue, two-phase salted top-K. The
      // salting phase pays a full extra shuffle+sort, so it's worth it
      // only when a mega-host's pending set is far larger than
      // salt×quota (the 10^10-frontier case); saltFanout=1 selects the
      // single-window plan. Results are identical either way (phase 2
      // is definitive; a global top-q row is a top-q row of its salt).
      val ord = Seq($"priority", $"discovered_seq", $"url_hash")
      val w2 = Window.partitionBy($"host").orderBy(ord: _*)
      val preFiltered =
        if (saltFanout <= 1) joined
        else {
          val w1 = Window.partitionBy($"host", $"salt").orderBy(ord: _*)
          joined
            .withColumn("salt", pmod($"url_hash", lit(saltFanout)))
            .withColumn("rn1", row_number().over(w1))
            .filter($"rn1" <= $"quota")
            .drop("salt", "rn1")
        }
      val admitted = preFiltered
        .withColumn("rn", row_number().over(w2))
        .filter($"rn" <= $"quota")
        .drop("rn", "quota")

      // W2: global cap (maxConnections analog) — TakeOrderedAndProject.
      val capped = c.maxPerRound match {
        case Some(k) => admitted.orderBy(ord: _*).limit(k)
        case None    => admitted
      }

      // S3+F6+F7: fetch + decode + extract — ONE pass over the admitted
      // set, staged straight into the `attempts` fact table (columnar
      // parquet). The documents table and the crawl log are *pruned
      // projections* of this table (parquet column pruning makes them
      // cheap), so the heavy nested span/link columns are shuffled
      // never and written exactly once. No row-object caching: columnar
      // scan beats a deserialized cache at every scale.
      // rebalance the slim admitted rows by url_hash before the heavy
      // fetch+encode stage: the window leaves host-hash partitioning,
      // whose skew (mega-host) would otherwise become a straggler task
      // in the most expensive stage of the round. The fetch itself is
      // the native FetchExtractExpr expression — Catalyst internal rows
      // end-to-end, no case-class/encoder layer (SURVEY.md §2.8).
      import org.apache.spark.sql.graftshim.ColumnShim
      val fetchCol = ColumnShim.column(graft.functions.FetchExtractExpr(
        ColumnShim.expression($"url_canon"),
        ColumnShim.expression($"retry_count"),
        ColumnShim.expression($"discovered_seq"), w, c, c.packedSpans))
      val attemptsOut = capped
        .select($"url", $"url_canon", $"url_hash", $"host", $"host_bucket",
          $"priority", $"discovered_seq", $"retry_count")
        .repartition($"url_hash")
        .withColumn("f", fetchCol)
        .select($"url", $"url_canon", $"url_hash", $"host", $"host_bucket",
          $"priority", $"discovered_seq", $"retry_count",
          $"f.ok".as("ok"), $"f.has_doc".as("has_doc"),
          $"f.spans".as("spans"), $"f.links".as("links"))
        .withColumn("round", lit(r))
      val attemptsFile = timed("fetch_stage", r) {
        ice.writeData(attemptsOut, ATTEMPTS, s"r$r")
      }
      val attempts = spark.read.parquet(attemptsFile)

      // one slim-column job for all attempt-side stats.
      val statsRow = timed("stats_agg", r) { attempts.agg(
        count(lit(1)), sum(when($"ok", 1L).otherwise(0L)),
        sum(size($"links"))).head() }
      val nAdmitted = statsRow.getLong(0)
      val nOk = if (statsRow.isNullAt(1)) 0L else statsRow.getLong(1)
      val nDiscovered = if (statsRow.isNullAt(2)) 0L else statsRow.getLong(2)
      val nFailed = nAdmitted - nOk
      val nCandidates = -1L // derivable but not worth a frontier scan

      // link discovery: flatten (links column only), min-seq dedup
      // within the round, bloom-prefilter, exact left_anti against the
      // frontier key set (J1/J2/A2).
      val flat = attempts.select(explode($"links").as("l")).select("l.*")
      val roundDedup = flat
        .groupBy($"url_hash")
        .agg(min(struct($"discovered_seq", $"priority", $"url_canon", $"host",
          $"host_bucket")).as("m"))
        .select($"url_hash", $"m.url_canon", $"m.host", $"m.host_bucket",
          $"m.priority", $"m.discovered_seq")

      val bloomMap = spark.sparkContext.broadcast(readBloom())
      val maybeSeen = roundDedup.filter(
        CrawlEngine.mightContainUdf(bloomMap)($"host_bucket", $"url_hash"))
      val definitelyNew = roundDedup.filter(
        !CrawlEngine.mightContainUdf(bloomMap)($"host_bucket", $"url_hash"))
      val survivors = maybeSeen.join(
        front.select($"url_hash"), Seq("url_hash"), "left_anti")
      val newEntries = definitelyNew.unionByName(survivors)
        .select($"url_canon".as("url"), $"url_canon", $"url_hash", $"host",
          $"host_bucket", $"priority", $"discovered_seq",
          lit(0).as("retry_count"), lit(r + 1).as("due_round"),
          lit(FrontierEntry.Pending).as("state"))

      // frontier update: retire attempted rows, merge outcomes + new —
      // all materialized by the single frontier write below.
      val newRetry = when($"ok", $"retry_count").otherwise($"retry_count" + 1)
      val updates = attempts.select(
        $"url", $"url_canon", $"url_hash", $"host", $"host_bucket",
        $"priority", $"discovered_seq",
        newRetry.cast("int").as("retry_count"),
        when($"ok", lit(r))
          .when(newRetry > c.maxRetries, lit(r))
          .otherwise(lit(r + 1) + newRetry).cast("long").as("due_round"),
        when($"ok", FrontierEntry.Done)
          .when(newRetry > c.maxRetries, FrontierEntry.Dropped)
          .otherwise(FrontierEntry.Pending).as("state"))
      val cols = updates.columns.map(col)
      val newFrontier = front.select(cols: _*)
        .join(updates.select($"url_hash"), Seq("url_hash"), "left_anti")
        .select(cols: _*)
        .unionByName(updates)
        .unionByName(newEntries.select(cols: _*))
        .repartition(c.numBuckets, $"host_bucket")
      // Hive-style state=<s>/ partitioning: the admission scan's
      // `state = 'pending'` predicate becomes a PartitionFilter, so the
      // done/dropped majority (at steady state, almost everything) is
      // never read during scheduling — only the url_hash column of all
      // partitions is touched, by the dedup anti-join.
      val frontierFile = timed("frontier_write", r) {
        ice.writeData(newFrontier, FRONTIER, s"r$r", partitionCols = Seq("state"))
      }

      // newly enqueued rows, read back from the written frontier file
      // (unique signature: pending, due r+1, no retries) — ONE job
      // computes the bloom deltas, the per-bucket enqueued counts, and
      // the total enqueued count (no second dedup-pipeline execution).
      val written = spark.read.parquet(frontierFile)
      val newRows = written.filter($"state" === FrontierEntry.Pending &&
        $"due_round" === (r + 1) && $"retry_count" === 0)
      val deltas = timed("bloom_enq", r) {
        buildBloomDeltas(newRows.select($"host_bucket", $"url_hash"))
      }
      val nEnqueued = deltas.valuesIterator.map(_._1).sum
      if (nEnqueued > 0)
        commitBloom(mergeBloom(readBloom(),
          deltas.map { case (b, (_, bits)) => b -> bits }))

      // per-partition lineage + metrics (BASELINE.json:14).
      val enqDf = spark.createDataset(
        deltas.toSeq.map { case (b, (n, _)) => (b, n) })
        .toDF("host_bucket", "enqueued")
      val lineageDf = attempts.groupBy($"host_bucket").agg(
        count(lit(1)).as("admitted"),
        sum(when($"ok", 1L).otherwise(0L)).as("fetched_ok"),
        sum(when(!$"ok", 1L).otherwise(0L)).as("failed"))
        .join(enqDf, Seq("host_bucket"), "full_outer")
        .na.fill(0L)
        .select(lit(r).as("round"), $"host_bucket", $"admitted", $"fetched_ok",
          $"failed", $"enqueued")
      val lineageFiles = timed("lineage_write", r) {
        if (nAdmitted + nEnqueued > 0) Seq(ice.writeData(lineageDf, LINEAGE, s"r$r"))
        else Nil }

      // atomic commit: everything becomes visible as snapshot r+1.
      if (nAdmitted > 0)
        ice.commit(ATTEMPTS, Seq(attemptsFile), append = true,
          Map("round" -> (r + 1).toString))
      lineageFiles.foreach(f => ice.commit(LINEAGE, Seq(f), append = true,
        Map("round" -> (r + 1).toString)))
      ice.commit(FRONTIER, Seq(frontierFile), append = false,
        Map("round" -> (r + 1).toString,
          "admitted" -> nAdmitted.toString, "enqueued" -> nEnqueued.toString))
      // snapshot GC: the frontier is replace-mode, so expired rounds'
      // data dirs become unreferenced and are physically deleted.
      c.retainSnapshots.foreach(k => ice.expireSnapshots(FRONTIER, k))

      RoundStats(r, nCandidates, nAdmitted, nOk, nFailed, nDiscovered, nEnqueued)
  }

  // ---- bloom sidecar -------------------------------------------------

  // expected URLs per bucket: (nHosts-1) ordinary hosts + one mega-host
  private def bloomBits: Int = {
    val totalPages = (web.nHosts - 1).toLong * web.pagesPerHost +
      web.pagesPerHost.toLong * web.megaFactor
    Bloom.sizeFor(math.max(1L, totalPages / math.max(1, cfg.numBuckets)))
  }

  // bloom blobs live on the driver between rounds (tiny: ~10 bits/URL);
  // the parquet copy exists only for checkpoint/resume.
  @transient private var bloomCache: Option[Map[Int, Array[Byte]]] = None

  /** One job: per-bucket bloom delta AND per-bucket enqueued count. */
  private def buildBloomDeltas(bucketHash: DataFrame): Map[Int, (Long, Array[Byte])] = {
    val bits = bloomBits
    bucketHash.as[(Int, Long)]
      .groupByKey(_._1)
      .mapGroups { (bucket, it) =>
        val arr = Bloom.empty(bits)
        var n = 0L
        it.foreach { case (_, h) => Bloom.add(arr, h); n += 1 }
        (bucket, n, arr)
      }.collect().map(t => t._1 -> (t._2, t._3)).toMap
  }

  private def mergeBloom(old: Map[Int, Array[Byte]],
      delta: Map[Int, Array[Byte]]): Map[Int, Array[Byte]] =
    (old.keySet ++ delta.keySet).map { b =>
      (old.get(b), delta.get(b)) match {
        case (Some(x), Some(y)) => b -> Bloom.or(x, y)
        case (Some(x), None)    => b -> x
        case (None, Some(y))    => b -> y
        case _                  => b -> Bloom.empty(bloomBits)
      }
    }.toMap

  private def commitBloom(m: Map[Int, Array[Byte]]): Unit = {
    val df = spark.createDataset(m.toSeq).toDF("host_bucket", "bits")
    ice.writeCommit(df, BLOOM, "bloom", append = false)
    bloomCache = Some(m)
  }

  private def readBloom(): Map[Int, Array[Byte]] = bloomCache.getOrElse {
    val m = ice.read(spark, BLOOM)
      .map(_.as[(Int, Array[Byte])].collect().toMap)
      .getOrElse(Map.empty)
    bloomCache = Some(m)
    m
  }
}

object CrawlEngine {
  import org.apache.spark.sql.expressions.UserDefinedFunction
  import org.apache.spark.broadcast.Broadcast

  /** A discovered-link candidate (pre-dedup). */
  final case class LinkCand(url_canon: String, url_hash: Long, host: String,
      host_bucket: Int, priority: Int, discovered_seq: Long)

  /** A fetch attempt outcome (one row per admitted URL per round). */
  final case class Attempt(
      url: String, url_canon: String, url_hash: Long, host: String,
      host_bucket: Int, priority: Int, discovered_seq: Long,
      retry_count: Int, ok: Boolean, has_doc: Boolean,
      spans: Seq[Span], links: Seq[LinkCand])

  /** Canonicalize + robots-gate one raw URL into a frontier candidate
    * (shared content rule; scheduling stays engine-side). */
  def toCand(web: SyntheticWeb, raw: String, priority: Int, seq: Long,
      numBuckets: Int): Option[LinkCand] =
    UrlCanonicalizer.canonicalize(raw).flatMap { canon =>
      val host = UrlCanonicalizer.hostOf(canon)
      val path = UrlCanonicalizer.pathOf(canon)
      if (!RobotsMatcher.allows(web.policy(host).rules, path)) None
      else Some(LinkCand(canon, Hashing.xxhash64(canon), host,
        Hashing.hostBucket(host, numBuckets), priority, seq))
    }

  def toEntry(web: SyntheticWeb, raw: String, priority: Int, seq: Long,
      due: Long, cfg: CrawlConfig): Option[FrontierEntry] =
    UrlCanonicalizer.canonicalize(raw).flatMap { canon =>
      val host = UrlCanonicalizer.hostOf(canon)
      val path = UrlCanonicalizer.pathOf(canon)
      if (!RobotsMatcher.allows(web.policy(host).rules, path)) None
      else Some(FrontierEntry(raw, canon, Hashing.xxhash64(canon), host,
        Hashing.hostBucket(host, cfg.numBuckets), priority, seq, 0, due,
        FrontierEntry.Pending))
    }

  def mightContainUdf(bm: Broadcast[Map[Int, Array[Byte]]]): UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (bucket: Int, hash: Long) =>
      bm.value.get(bucket).exists(bits => Bloom.mightContain(bits, hash))
    }
}
