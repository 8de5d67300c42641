package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Hashing, SyntheticWeb, UrlCanonicalizer}
import graft.streaming.StreamingOps

/** Structured Streaming façade tests (SURVEY.md §2.9): bounded replay
  * via Trigger.AvailableNow into memory sinks. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeSeeds(urls: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-seeds")
    Files.write(dir.resolve("seeds.txt"),
      urls.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("streaming seed ingest canonicalizes, dedups, and robots-gates") {
    val web = SyntheticWeb(nHosts = 4, pagesPerHost = 10)
    val urls = Seq(
      "HTTP://h0001.example:80/p/3#frag",   // canonicalizes
      "http://h0001.example/p/3",            // duplicate of the above
      "http://h0002.example/private/p/1",    // robots-disallowed (host 2)
      "ftp://junk",                           // non-http
      "http://h0003.example/p/5?b=2&a=1")
    val dir = writeSeeds(urls)
    val cp = Files.createTempDirectory("graft-cp").toString
    val q = StreamingOps.dedupedSeeds(spark, dir, web)
      .writeStream.format("memory").queryName("seeds_t")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT url_canon FROM seeds_t").collect()
      .map(_.getString(0)).sorted
    assert(rows === Array(
      "http://h0001.example/p/3",
      "http://h0003.example/p/5?a=1&b=2"))
  }

  test("streaming polite admitter enforces per-host quota with state") {
    val web = SyntheticWeb(nHosts = 4, pagesPerHost = 50)
    val urls = (0 until 12).map(i => s"http://h0001.example/p/$i") ++
      (0 until 3).map(i => s"http://h0003.example/p/$i")
    val dir = writeSeeds(urls)
    val cp = Files.createTempDirectory("graft-cp2").toString
    val cands = StreamingOps.seedStream(spark, dir, web)
    val q = StreamingOps.politeAdmitter(spark, cands, quotaPerBatch = 5)
      .writeStream.format("memory").queryName("admit_t")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val byHost = spark.sql("SELECT host, count(*) FROM admit_t GROUP BY host")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byHost("h0001.example") === 5) // quota-capped
    assert(byHost("h0003.example") === 3) // under quota
    // deterministic pick: the 5 smallest url_hash values win
    val admitted = spark.sql(
      "SELECT url_hash FROM admit_t WHERE host = 'h0001.example'")
      .collect().map(_.getLong(0)).toSet
    val expected = (0 until 12)
      .map(i => Hashing.xxhash64(s"http://h0001.example/p/$i"))
      .sorted.take(5).toSet
    assert(admitted === expected)
  }

  test("admitter is memory-bounded: a 100x-over-quota mega-host still picks the exact top-K") {
    val web = SyntheticWeb(nHosts = 4, pagesPerHost = 500)
    val quota = 4
    val urls = (0 until quota * 100).map(i => s"http://h0001.example/p/$i")
    val dir = writeSeeds(urls)
    val cp = Files.createTempDirectory("graft-cp4").toString
    val cands = StreamingOps.seedStream(spark, dir, web)
    val q = StreamingOps.politeAdmitter(spark, cands, quotaPerBatch = quota)
      .writeStream.format("memory").queryName("admit_mega")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      "SELECT url_hash, batch_rank FROM admit_mega ORDER BY batch_rank")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.length === quota)
    // exact top-K semantics preserved by the bounded heap: the K
    // smallest hashes, emitted in ascending order
    val expected = urls.map(UrlCanonicalizer.canonicalize(_).get)
      .map(Hashing.xxhash64).sorted.take(quota)
    assert(rows.map(_._1).toSeq === expected)
    assert(rows.map(_._2).toSeq === (0 until quota))
  }

  test("streaming exact document dedup: one survivor per fingerprint across batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.md5
    val in = Files.createTempDirectory("graft-docstream").toString
    val cp = Files.createTempDirectory("graft-cp4").toString
    // batch 1: docs 0-9; batch 2 arrives later: copies of 0-4 under new
    // ids + genuinely new 10-14
    val mk = (ids: Seq[Long], textOf: Long => String) =>
      ids.map(i => (i, textOf(i), "en", "web"))
        .toDF("doc_id", "text", "lang", "source")
    mk(0L to 9L, i => s"unique text $i").coalesce(1)
      .write.parquet(s"$in/b1.parquet")
    val outDir = Files.createTempDirectory("graft-docstream-out").toString
    def runOnce(): Unit = {
      val q = StreamingOps.dedupedDocuments(spark, s"$in/*")
        .writeStream.format("parquet").option("path", outDir)
        .outputMode("append").option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    assert(spark.read.parquet(outDir).count() === 10L)
    mk(100L to 104L, i => s"unique text ${i - 100}").coalesce(1)
      .write.parquet(s"$in/b2.parquet") // dup content, new ids
    mk(10L to 14L, i => s"unique text $i").coalesce(1)
      .write.parquet(s"$in/b3.parquet")
    runOnce()
    // across BOTH runs (same checkpoint = same dedup state), only the
    // 5 genuinely new docs survive the second batch
    val all = spark.read.parquet(outDir).collect()
    assert(all.length === 15, s"expected 15 total rows, got ${all.length}")
    val ids = all.map(_.getAs[Long]("doc_id")).toSet
    assert(ids === ((0L to 14L).toSet), s"dup content leaked: $ids")
  }

  test("incremental MinHash dedup: cross-batch near-dups drop against the " +
    "persisted SignatureStore; the store equals a batch rebuild") {
    import spark.implicits._
    import graft.operators.TextOps
    val in = Files.createTempDirectory("graft-snd-in").toString
    val store = Files.createTempDirectory("graft-snd-store").toString
    val cp = Files.createTempDirectory("graft-snd-cp").toString
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val tB = "omega psi chi phi upsilon tau sigma rho pi omicron " * 8
    val tC = "quark lepton boson gluon photon meson baryon hadron spin charm " * 8
    def mk(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      rows.map { case (i, t) => (i, t, "en", "web") }
        .toDF("doc_id", "text", "lang", "source")
    def runOnce(): Unit =
      StreamingOps.nearDupDedupStream(spark, s"$in/*", store, cp).awaitTermination()

    // batch 1: docs 1/2 near-dup (min id 1 survives), 3 unique
    mk(Seq(1L -> tA, 2L -> (tA + " tail"), 3L -> tB))
      .coalesce(1).write.parquet(s"$in/b1.parquet")
    runOnce()
    def storeIds: Set[Long] = spark.read.parquet(s"$store/signatures")
      .select("doc_id").as[Long].collect().toSet
    assert(storeIds === Set(1L, 3L), s"batch-1 survivors wrong: $storeIds")

    // batch 2: 4 is a near-dup of batch-1's tA (must drop AGAINST THE
    // STORE), 5 is genuinely new
    mk(Seq(4L -> (tA + " more"), 5L -> tC))
      .coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce()
    assert(storeIds === Set(1L, 3L, 5L), s"cross-batch dedup wrong: $storeIds")

    // the incrementally-built store row-equals a batch rebuild over the
    // surviving documents (signature determinism — the contract that
    // lets batch and stream consumers share one store)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map { r =>
        (r.getAs[Long]("doc_id"),
          (0 until 32).map(i => r.getAs[Long](s"mh_$i")),
          r.getAs[scala.collection.Seq[Long]]("ss").sorted.toSeq)
      }.sortBy(_._1).toSeq
    val rebuilt = TextOps.signaturesOf(
      mk(Seq(1L -> tA, 3L -> tB, 5L -> tC)))
    assert(canon(spark.read.parquet(s"$store/signatures")) === canon(rebuilt),
      "incremental store diverges from batch rebuild")
  }

  test("incremental MinHash dedup gates on a scheme-qualified (file:) store " +
    "path and a replayed batch leaves the store row-equal") {
    import spark.implicits._
    import graft.operators.TextOps
    // the round-4 defect class: a java.nio existence probe returns
    // false for any scheme-qualified URI, silently disabling the
    // cross-batch gate. The store dir here is a file:-scheme URI that
    // only resolves through the Hadoop FileSystem — the same resolution
    // path hdfs:// and s3a:// take.
    val localStore = Files.createTempDirectory("graft-snd-uri").toString
    val store = "file:" + localStore
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val tC = "quark lepton boson gluon photon meson baryon hadron spin charm " * 8
    def mk(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      rows.map { case (i, t) => (i, t, "en", "web") }
        .toDF("doc_id", "text", "lang", "source")
    def storeIds: Set[Long] = spark.read.parquet(s"$store/signatures")
      .select("doc_id").as[Long].collect().toSet

    StreamingOps.dedupBatchAppend(mk(Seq(1L -> tA)), batchId = 0L, store)
    assert(storeIds === Set(1L))
    // batch 1: doc 4 near-dups batch 0's tA — MUST drop via the store
    // gate (with the java.nio probe this leaked through); doc 5 is new
    StreamingOps.dedupBatchAppend(mk(Seq(4L -> (tA + " more"), 5L -> tC)),
      batchId = 1L, store)
    assert(storeIds === Set(1L, 5L),
      s"cross-batch gate did not fire on a file:-scheme store: $storeIds")

    // foreachBatch RETRY: replaying batch 1 must not duplicate rows or
    // drop extra docs (the batch=1 partition is atomically replaced and
    // the gate reads only batch < 1)
    StreamingOps.dedupBatchAppend(mk(Seq(4L -> (tA + " more"), 5L -> tC)),
      batchId = 1L, store)
    val rows = spark.read.parquet(s"$store/signatures")
      .select("doc_id").as[Long].collect().toSeq
    assert(rows.sorted === Seq(1L, 5L),
      s"replayed batch changed the store: $rows")
    // and the replayed store still equals a clean batch rebuild
    val rebuilt = TextOps.signaturesOf(mk(Seq(1L -> tA, 5L -> tC)))
      .select("doc_id").as[Long].collect().toSet
    assert(storeIds === rebuilt)
  }

  test("incremental dedup adopts a pre-existing FLAT SignatureStore as " +
    "batch=-1 and gates against it; the store stays readable") {
    import spark.implicits._
    import graft.operators.SignatureStore
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val tB = "omega psi chi phi upsilon tau sigma rho pi omicron " * 8
    val tC = "quark lepton boson gluon photon meson baryon hadron spin charm " * 8
    // a flat-layout store built by the BATCH pipeline
    val docsDir = Files.createTempDirectory("graft-flat-docs").toString
    Seq((1L, tA), (3L, tB)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$docsDir/documents.parquet")
    val store = Files.createTempDirectory("graft-flat-store").toString
    SignatureStore.build(spark, docsDir, store)
    // first streamed batch: 4 near-dups the flat store's tA (must drop
    // against the ADOPTED batch=-1 rows), 5 is new
    val batch = Seq((4L, tA + " more", "en", "web"), (5L, tC, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    StreamingOps.dedupBatchAppend(batch, batchId = 0L, store)
    val ids = SignatureStore.signatures(spark, store)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L, 5L),
      s"flat store not adopted by the cross-batch gate: $ids")
    // layout is now uniformly batch-keyed: no mixed-structure failure,
    // and the batch consumers (candidatePairs) still read it
    assert(SignatureStore.candidatePairs(spark, store).columns.nonEmpty)
  }

  test("incremental SimHash gate: stream survivors equal the batch-semantics " +
    "fold; cross-batch Hamming<=3 drops against the store; replay idempotent") {
    import spark.implicits._
    import graft.operators.TextOps
    val sfDir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-shd-in").toString
    val store = Files.createTempDirectory("graft-shd-store").toString
    val cp = Files.createTempDirectory("graft-shd-cp").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source")
    // golden signature map — the exact stream/store formula
    val sh: Map[Long, Long] = TextOps.simhashOf(docs.select($"doc_id", $"text"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val b1Ids = sh.keySet.filter(_ < 250L)
    // batch 2 = the rest + a planted EXACT dup (Hamming 0) of a batch-1
    // doc, so a cross-batch drop is guaranteed on any fixture
    val plantedSrc = b1Ids.min
    val plantedText = docs.filter($"doc_id" === plantedSrc)
      .select($"text").as[String].head()
    docs.filter($"doc_id" < 250L).coalesce(1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit =
      StreamingOps.simhashDedupStream(spark, s"$in/*", store, cp)
        .awaitTermination()
    runOnce()
    // batch-semantics fold (what the stream MUST implement): within a
    // batch any doc Hamming<=3 of a smaller-id batch doc drops; across
    // batches a doc drops only against prior SURVIVORS
    def foldBatch(prior: Set[Long], batch: Seq[Long],
        shOf: Long => Long): Set[Long] = {
      val bs = batch.sorted
      bs.filterNot { b =>
        bs.exists(a => a < b && ham(shOf(a), shOf(b)) <= 3) ||
          prior.exists(sv => ham(shOf(sv), shOf(b)) <= 3)
      }.toSet
    }
    def storeIds: Set[Long] = spark.read.parquet(s"$store/simhashes")
      .select("doc_id").as[Long].collect().toSet
    val surv1 = foldBatch(Set.empty, b1Ids.toSeq, sh)
    assert(storeIds === surv1, "batch-1 survivors diverge from the fold")

    val b2Ids = sh.keySet.filterNot(_ < 250L)
    docs.filter($"doc_id" >= 250L)
      .union(Seq((9999L, plantedText, "en", "web"))
        .toDF("doc_id", "text", "lang", "source"))
      .coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce()
    val sh2 = sh + (9999L -> sh(plantedSrc))
    val surv2 = surv1 ++ foldBatch(surv1, (b2Ids + 9999L).toSeq, sh2)
    assert(storeIds === surv2, "batch-2 survivors diverge from the fold")
    assert(!storeIds.contains(9999L), "planted cross-batch dup survived")
    assert(storeIds.size < sh.size + 1, "no near-dup ever dropped — vacuous")

    // replay idempotence: re-applying the last batch leaves the store
    // row-equal (batch=1 partition overwritten, gate reads batch < 1)
    val replay = docs.filter($"doc_id" >= 250L)
      .union(Seq((9999L, plantedText, "en", "web"))
        .toDF("doc_id", "text", "lang", "source"))
    StreamingOps.simhashBatchApply(replay, batchId = 1L, store)
    assert(storeIds === surv2, "replayed batch changed the store")
    // and the store's signatures equal the batch formula on survivors
    val stored = spark.read.parquet(s"$store/simhashes")
      .select("doc_id", "sh").as[(Long, Long)].collect().toMap
    assert(stored === surv2.map(id => id -> sh2(id)).toMap)
  }

  test("simhash gate adopts a pre-existing FLAT SimhashStore as batch=-1 " +
    "and gates against it") {
    import spark.implicits._
    import graft.operators.SimhashStore
    val corpus = Files.createTempDirectory("graft-shd-flat-src").toString
    val store = Files.createTempDirectory("graft-shd-flat").toString
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 8
    val tC = "quark lepton boson gluon photon meson baryon hadron spin charm " * 8
    Seq((1L, tA, "en", "web"), (3L, tC, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.parquet(s"$corpus/documents.parquet")
    SimhashStore.build(spark, corpus, store) // FLAT layout
    // batch 0: doc 4 is an exact dup of the flat store's tA (Hamming 0)
    // — must drop against the ADOPTED batch=-1 partition; doc 5 is new
    StreamingOps.simhashBatchApply(
      Seq((4L, tA, "en", "web"), (5L, "omega psi chi " * 20, "en", "web"))
        .toDF("doc_id", "text", "lang", "source"),
      batchId = 0L, store)
    val ids = spark.read.parquet(s"$store/simhashes")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L, 5L),
      s"flat store not adopted / gate missed the dup: $ids")
    // the adopted layout is batch-partitioned and stays readable
    val batches = spark.read.parquet(s"$store/simhashes")
      .select("batch").distinct().as[Long].collect().toSet
    assert(batches === Set(-1L, 0L), s"unexpected batch layout: $batches")
  }

  test("streaming LM scoring: batch-invariant verdicts equal the batch q79 " +
    "gate; unseen trigrams are counted, not dropped; replay idempotent") {
    import spark.implicits._
    import graft.operators.LmStore
    val sfDir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-lm-in").toString
    val store = Files.createTempDirectory("graft-lm-store").toString
    val out = Files.createTempDirectory("graft-lm-out").toString
    val cp = Files.createTempDirectory("graft-lm-cp").toString
    LmStore.build(spark, sfDir, store)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source")
    docs.filter($"doc_id" < 250L).coalesce(1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit =
      StreamingOps.lmScoreStream(spark, s"$in/*", store, out, cp)
        .awaitTermination()
    runOnce()
    // batch 2: the rest + a doc whose trigrams the model never saw
    docs.filter($"doc_id" >= 250L)
      .union(Seq((9999L, "@@@###$$$%%%", "en", "web"))
        .toDF("doc_id", "text", "lang", "source"))
      .coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce()

    val got = spark.read.parquet(out)
      .select("doc_id", "n_trigrams", "total_micro_nats", "n_unknown")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // known-corpus docs: verdicts equal the batch q79 gate (which
    // zero-fills trigram-less docs; the stream emits only docs with
    // trigrams — compare where both speak)
    val batch = SparkEntry.queries("q79_charlm_score")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    batch.filter(_._2 > 0).foreach { case (id, n, tot) =>
      assert(got(id) === ((n, tot, 0L)), s"doc $id diverged from batch q79")
    }
    // the planted doc: 10 trigrams total, the unseen ones counted as
    // unknown (not silently dropped)
    assert(got(9999L)._3 > 0L && got(9999L)._1 + got(9999L)._3 === 10L,
      s"unknown trigrams mishandled: ${got(9999L)}")

    // replay the last batch — rows must stay identical
    val before = spark.read.parquet(out).collect().toSet
    StreamingOps.lmScoreBatchApply(
      docs.filter($"doc_id" >= 250L)
        .union(Seq((9999L, "@@@###$$$%%%", "en", "web"))
          .toDF("doc_id", "text", "lang", "source")),
      batchId = 1L, store, out)
    assert(spark.read.parquet(out).collect().toSet === before,
      "replayed batch changed the verdicts")
  }

  test("streaming DSIR weighting: batch-invariant verdicts equal the batch " +
    "q80 gate; unshared trigrams are counted, not dropped; replay idempotent") {
    import spark.implicits._
    import graft.operators.LmStore
    val sfDir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-dsir-in").toString
    val store = Files.createTempDirectory("graft-dsir-store").toString
    val out = Files.createTempDirectory("graft-dsir-out").toString
    val cp = Files.createTempDirectory("graft-dsir-cp").toString
    LmStore.build(spark, sfDir, store)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source")
    docs.filter($"doc_id" < 250L).coalesce(1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit =
      StreamingOps.dsirScoreStream(spark, s"$in/*", store, out, cp)
        .awaitTermination()
    runOnce()
    // batch 2: the rest + a doc whose trigrams neither model ever saw
    docs.filter($"doc_id" >= 250L)
      .union(Seq((9999L, "@@@###$$$%%%", "en", "web"))
        .toDF("doc_id", "text", "lang", "source"))
      .coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce()

    val got = spark.read.parquet(out)
      .select("doc_id", "n_shared", "weight_micro_nats", "n_unshared")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // known-corpus docs: verdicts equal the batch q80 gate (which
    // zero-fills trigram-less docs; the stream emits only docs with
    // trigrams — compare on every doc the stream spoke for)
    val batch = SparkEntry.queries("q80_dsir_weights")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    got.foreach { case (id, (ns, w, _)) =>
      if (id != 9999L)
        assert(batch(id) === ((ns, w)), s"doc $id diverged from batch q80")
    }
    // the planted doc: 10 trigrams total, the ones outside the shared
    // support counted as unshared (not silently dropped)
    assert(got(9999L)._3 > 0L && got(9999L)._1 + got(9999L)._3 === 10L,
      s"unshared trigrams mishandled: ${got(9999L)}")

    // replay the last batch — rows must stay identical
    val before = spark.read.parquet(out).collect().toSet
    StreamingOps.dsirBatchApply(
      docs.filter($"doc_id" >= 250L)
        .union(Seq((9999L, "@@@###$$$%%%", "en", "web"))
          .toDF("doc_id", "text", "lang", "source")),
      batchId = 1L, store, out)
    assert(spark.read.parquet(out).collect().toSet === before,
      "replayed batch changed the verdicts")
  }

  test("streaming PQ encode: frozen-codebook codes equal the base encode; " +
    "probe serves base ∪ delta; replay idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col}
    import graft.operators.IvfPqIndex
    val sfDir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-pq-in").toString
    val index = Files.createTempDirectory("graft-pq-index").toString
    val cp = Files.createTempDirectory("graft-pq-cp").toString
    IvfPqIndex.build(spark, sfDir, index)
    // stream clones of 5 existing vectors under NEW ids — a frozen
    // index version must encode an identical vector identically
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" < 5L)
    emb.select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label")
      .coalesce(1).write.parquet(s"$in/b1.parquet")
    StreamingOps.pqEncodeStream(spark, s"$in/*", index, cp).awaitTermination()

    val codeCols = (0 until 4).map(b => s"code_$b")
    def codesOf(path: String, shift: Long): Map[Long, (Seq[Long], Int)] =
      spark.read.parquet(path)
        .select(($"vec_id" - shift).as("vec_id"),
          array(codeCols.map(col): _*).as("codes"), $"cid")
        .as[(Long, Seq[Long], Int)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val base = codesOf(s"$index/cells", 0L).filter(_._1 < 5L)
    val delta = codesOf(s"$index/cells_delta", 100000L)
    assert(delta.keySet === base.keySet)
    delta.foreach { case (id, enc) =>
      assert(enc === base(id), s"vec $id re-encoded differently: $enc vs ${base(id)}")
    }

    // probe: an exact duplicate pair must surface together — the
    // clone's cosine ties the original's, so both sit in the top-k
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head()
    val top = IvfPqIndex.probe(spark, index, qv,
      nprobe = graft.operators.VectorOps.IvfK, topK = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(top.contains(0L) && top.contains(100000L),
      s"probe missed the streamed clone: $top")

    // replay the batch — rows must stay identical
    val before = spark.read.parquet(s"$index/cells_delta").collect().toSet
    IvfPqIndex.encodeBatch(
      emb.select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label"),
      batchId = 0L, index)
    assert(spark.read.parquet(s"$index/cells_delta").collect().toSet === before,
      "replayed batch changed the delta")
  }

  test("SimhashStore attach routes q70 through the persisted signatures") {
    import spark.implicits._
    import graft.operators.SimhashStore
    val sfDir = "/root/testdata/sf0.001"
    val store = Files.createTempDirectory("graft-shd-att").toString
    SimhashStore.build(spark, sfDir, store)
    val fresh = SparkEntry.queries("q70_simhash_neardup")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    SimhashStore.attach(sfDir, store, snapshot = "v1")
    try {
      val df = SparkEntry.queries("q70_simhash_neardup")(spark, sfDir)
      assert(df.queryExecution.analyzed.toString.contains(store) ||
        df.queryExecution.executedPlan.toString.contains(store),
        "attached q70 does not read the store")
      assert(df.as[(Long, Long, Long)].collect().toSeq === fresh)
    } finally SimhashStore.detach(sfDir)
  }

  test("LmStore attach routes q79/q80 through the persisted model/delta") {
    import spark.implicits._
    import graft.operators.LmStore
    val sfDir = "/root/testdata/sf0.001"
    val store = Files.createTempDirectory("graft-lm-att").toString
    LmStore.build(spark, sfDir, store)
    val fresh79 = SparkEntry.queries("q79_charlm_score")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val fresh80 = SparkEntry.queries("q80_dsir_weights")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    LmStore.attach(sfDir, store, snapshot = "v1")
    try {
      val d79 = SparkEntry.queries("q79_charlm_score")(spark, sfDir)
      assert(d79.queryExecution.analyzed.toString.contains(store) ||
        d79.queryExecution.executedPlan.toString.contains(store),
        "attached q79 does not read the store")
      assert(d79.as[(Long, Long, Long)].collect().toSeq === fresh79)
      // the cached weight frame hides the scan — assert the BUILDER
      // reads the persisted delta while attached
      val b80 = graft.operators.TextOps
        .dsirWeightFrameUncached(spark, sfDir)
      assert(b80.queryExecution.analyzed.toString.contains("dsir_delta") ||
        b80.queryExecution.executedPlan.toString.contains("dsir_delta"),
        "attached q80 does not read the persisted delta")
      val d80 = SparkEntry.queries("q80_dsir_weights")(spark, sfDir)
      assert(d80.as[(Long, Long, Long)].collect().toSeq === fresh80)
    } finally LmStore.detach(sfDir)
  }

  test("incremental corpus diff: batched deltas + closing deletions equal " +
    "the one-shot q55 answer; a replayed batch leaves the store row-equal") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    // the exact v1/v2 synthesis rules of q55, applied to real frames
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source")
    val v1 = docs.filter($"doc_id" % 9 =!= 0)
    val v2 = docs.filter($"doc_id" % 7 =!= 0)
      .select($"doc_id",
        org.apache.spark.sql.functions.when($"doc_id" % 13 === 0,
          org.apache.spark.sql.functions.concat($"text",
            org.apache.spark.sql.functions.lit(" updated")))
          .otherwise($"text").as("text"),
        $"lang", $"source")
    val in = Files.createTempDirectory("graft-cdiff-in").toString
    val store = Files.createTempDirectory("graft-cdiff-store").toString
    val cp = Files.createTempDirectory("graft-cdiff-cp").toString
    StreamingOps.buildDiffIndex(v1, store)
    // v2 arrives as two micro-batches (two stream runs, the dedup-test
    // convention); each doc_id appears in exactly one batch
    val part0 = v2.filter($"doc_id" % 2 === 0)
    val part1 = v2.filter($"doc_id" % 2 =!= 0)
    def runOnce(): Unit =
      StreamingOps.corpusDiffStream(spark, s"$in/*", store, cp)
        .awaitTermination()
    part0.coalesce(1).write.parquet(s"$in/b0.parquet")
    runOnce()
    part1.coalesce(1).write.parquet(s"$in/b1.parquet")
    runOnce()

    def streamedDiff: Set[(Long, String)] =
      StreamingOps.diffDeltas(spark, store).select($"doc_id", $"status")
        .union(StreamingOps.diffDeletions(spark, store, sinceBatch = 0L))
        .as[(Long, String)].collect().toSet
    val expected = graft.operators.PipelineOps
      .queries("q55_corpus_diff")(spark, sfDir)
      .as[(Long, String)].collect().toSet
    val got = streamedDiff
    assert(got === expected, "streamed diff diverges from the one-shot q55")
    // all four statuses genuinely exercised by the fixture
    assert(Set("added", "deleted", "modified", "unchanged")
      .subsetOf(got.map(_._2)), s"statuses: ${got.map(_._2)}")

    // replay idempotence: re-applying batch 0 (a foreachBatch retry)
    // recomputes against strictly-prior index batches only, so both
    // tables stay row-equal and the diff answer does not move
    StreamingOps.diffBatchApply(part0.toDF(), 0L, store)
    assert(streamedDiff === expected, "replayed batch changed the answer")
  }

  test("streaming decontamination: batch-invariant verdicts equal the batch q47 gate") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val store = Files.createTempDirectory("graft-dcstore").toString
    StreamingOps.buildDecontamStore(spark, src, store)
    val in = Files.createTempDirectory("graft-dcin").toString
    val out = Files.createTempDirectory("graft-dcout").toString
    val cp = Files.createTempDirectory("graft-dccp").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit = {
      val q = StreamingOps.decontamStream(spark, s"$in/*", store, out, cp)
      q.awaitTermination(120000)
    }
    runOnce()
    docs.filter($"doc_id" % 2 =!= 0).coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce()
    // a verdict depends only on the doc's text + the store, so the
    // union across batches must equal the batch gate's non-benchmark
    // rows regardless of the 2-way corpus split
    val got = spark.read.parquet(out)
      .select($"doc_id", $"n_hits", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exp = SparkEntry.queries("q47_decontam")(spark, src)
      .filter(!$"is_benchmark")
      .select($"doc_id", $"n_hits", $"contaminated")
      .as[(Long, Long, Boolean)].collect()
    assert(got.size === exp.length)
    exp.foreach { case (id, h, c) =>
      assert(got(id) === ((h, c)), s"doc $id") }
    assert(exp.exists(_._3), "fixture should contain contamination")
    // retry idempotence: re-applying the last batch overwrites its own
    // subdirectory, never duplicates
    val before = spark.read.parquet(out).count()
    StreamingOps.decontamBatchApply(
      docs.filter($"doc_id" % 2 =!= 0), 1L, store, out)
    assert(spark.read.parquet(out).count() === before)
  }

  test("streaming substring scrub: batch-invariant verdicts equal the " +
    "batch q73 gate against the same store version") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val store = Files.createTempDirectory("graft-scrubstore").toString
    StreamingOps.buildScrubStore(spark, src, store)
    val in = Files.createTempDirectory("graft-scrubin").toString
    val out = Files.createTempDirectory("graft-scrubout").toString
    val cp = Files.createTempDirectory("graft-scrubcp").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit = {
      val q = StreamingOps.scrubStream(spark, s"$in/*", store, out, cp)
      q.awaitTermination(120000)
    }
    runOnce()
    docs.filter($"doc_id" % 2 =!= 0).coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce()
    // a verdict depends only on the doc's text + the store, so the
    // union across batches must equal the one-shot q73 gate
    val got = spark.read.parquet(out)
      .select($"doc_id", $"n_tokens", $"n_removed", $"clean_md5")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val exp = SparkEntry.queries("q73_substring_scrub")(spark, src)
      .as[(Long, Long, Long, String)].collect()
    assert(got.size === exp.length)
    exp.foreach { case (id, nt, nr, h) =>
      assert(got(id) === ((nt, nr, h)), s"doc $id") }
    assert(exp.exists(_._3 > 0), "fixture should contain removals")
    // retry idempotence: re-applying the last batch overwrites its own
    // subdirectory, never duplicates
    val before = spark.read.parquet(out).count()
    StreamingOps.scrubBatchApply(
      docs.filter($"doc_id" % 2 =!= 0), 1L, store, out)
    assert(spark.read.parquet(out).count() === before)
  }

  test("streaming interleaved packer: arrival-order fold with O(1) " +
    "per-shard state; checkpoint restart continues mid-window") {
    import spark.implicits._
    val src = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-packin").toString
    val out = Files.createTempDirectory("graft-packout").toString
    val cp = Files.createTempDirectory("graft-packcp").toString
    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.parquet(s"$in/b1.parquet")
    def runOnce(): Unit = {
      val q = StreamingOps.packStream(spark, s"$in/*", out, cp)
      q.awaitTermination(120000)
    }
    runOnce()
    docs.filter($"doc_id" % 2 =!= 0).coalesce(1).write.parquet(s"$in/b2.parquet")
    runOnce() // separate start = the fold continues from checkpointed state
    // plain-Scala reference: the same cost model folded over the two
    // batch sequences, each batch's shard group in (skey, doc_id) order
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val all = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    def costOf(id: Long, tx: String): (Long, Long, Long, Long, Long) = {
      val nTok = (tx.count(_ == ' ') + 1).toLong
      val skey = java.lang.Long.parseLong(md5hex(s"shard|$id").take(8), 16)
      val nch = (nTok + 7) / 8
      val nMedia = (0L until nch).count(i => (id * 31 + i) % 4 == 0).toLong
      (skey % 8, skey, nTok, nMedia, nTok + 64L * nMedia)
    }
    val state = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val exp = Seq(all.filter(_._1 % 2 == 0), all.filter(_._1 % 2 != 0))
      .flatMap { batch =>
        batch.map { case (id, tx) => (id, costOf(id, tx)) }
          .groupBy(_._2._1).toSeq.flatMap { case (shard, rows) =>
            var (win, fill) = state.getOrElse(shard, (0L, 0L))
            val packed = rows.sortBy(r => (r._2._2, r._1)).map {
              case (id, (_, _, nt, nm, cost)) =>
                if (fill == 0L) fill = cost
                else if (fill + cost <= 2048L) fill += cost
                else { win += 1L; fill = cost }
                (shard, win, id, nt, nm, cost, fill)
            }
            state(shard) = (win, fill)
            packed
          }
      }.toSet
    val got = spark.read.parquet(out)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === exp)
    // the fold genuinely crossed batches: a window holding docs of both
    // parities can only exist if batch 2 resumed batch 1's fill state
    val crossBatch = got.groupBy(r => (r._1, r._2)).values
      .exists(v => v.map(_._3 % 2).size > 1)
    assert(crossBatch, "no window spans both batches — state did not persist")
  }

  test("watermarked windowed aggregation over the events file stream") {
    val cp = Files.createTempDirectory("graft-cp3").toString
    val q = StreamingOps.eventWindowCounts(spark, "/root/testdata/sf0.001")
      .writeStream.format("memory").queryName("win_t")
      .outputMode("append")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val total = spark.sql("SELECT CAST(SUM(n) AS BIGINT) FROM win_t").collect()(0)
    // append mode emits only windows older than the watermark; the tail
    // may be withheld, so compare against a recomputed batch aggregate
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val batchTotal = batch.count()
    assert(!total.isNullAt(0) && total.getLong(0) > 0)
    assert(total.getLong(0) <= batchTotal)
    val perType = spark.sql("SELECT event_type, SUM(n) FROM win_t GROUP BY event_type")
    assert(perType.count() >= 3)
  }
}
