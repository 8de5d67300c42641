package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Operator-surface smoke + semantics tests over the sf0.001 corpus.
  * (Hash-level equality vs DuckDB is the driver's job; here we assert
  * shapes, determinism, and algorithmic properties.) */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q71: interleaved packing equals a sequential greedy fold; " +
    "document-atomic (no multi-doc window over capacity)") {
    import spark.implicits._
    // independent reference: the greedy first-fit fold in plain Scala
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val costed = docs.map { case (id, tx) =>
      val nTok = tx.count(_ == ' ') + 1 // whitespace tokens = #spaces + 1
      val skey = java.lang.Long.parseLong(md5hex(s"shard|$id").take(8), 16)
      val nch = (nTok + 7) / 8
      val nMedia = (0L until nch).count(i => (id * 31 + i) % 4 == 0).toLong
      (skey % 8, skey, id, nTok.toLong, nMedia, nTok + 64L * nMedia)
    }
    val exp = costed.groupBy(_._1).toSeq.flatMap { case (shard, rows) =>
      var win = 0L; var fill = 0L
      rows.sortBy(r => (r._2, r._3)).map { case (_, _, id, nt, nm, cost) =>
        if (fill == 0L) fill = cost
        else if (fill + cost <= 2048L) fill += cost
        else { win += 1; fill = cost }
        (shard, win, id, nt, nm, cost, fill)
      }
    }.toSet
    val got = SparkEntry.queries("q71_interleaved_pack")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === exp)
    // atomicity invariant: a window over capacity holds exactly one doc
    val byWin = got.groupBy(r => (r._1, r._2))
    assert(byWin.values.forall(v => v.map(_._7).max <= 2048L || v.size == 1))
    assert(byWin.size > 1, "fixture should produce multiple windows")
  }

  test("q72: split assignment is leakage-safe — clusters are split-pure " +
    "and no LSH near-dup pair straddles a split boundary") {
    import spark.implicits._
    val got = SparkEntry.queries("q72_split_assign")(spark, dir)
      .as[(Long, Long, String)].collect()
    // cluster purity by construction
    assert(got.groupBy(_._2).values.forall(_.map(_._3).distinct.size == 1))
    // end-to-end: the ACTUAL near-dup candidate pairs never straddle
    val split = got.map(r => r._1 -> r._3).toMap
    val pairs = TextOps.lshCandidatePairs(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    assert(pairs.forall { case (a, b) => split(a) == split(b) })
    // all three splits are populated and proportions are plausible
    val n = got.length.toDouble
    val frac = got.groupBy(_._3).map { case (k, v) => k -> v.length / n }
    assert(frac.keySet === Set("train", "val", "test"), s"splits: $frac")
    assert(frac("train") > 0.7, s"train fraction off: $frac")
  }

  test("q75: PQ codes equal a plain-Scala per-block Lloyd recompute " +
    "(same seeding, 2 iterations, 6dp means, (d, cid) argmin)") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val n = vecs.length.toLong
    val byId = vecs.toMap
    def roundDp(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def argmin(cents: IndexedSeq[Array[Double]], v: Array[Double]): Int = {
      var best = -1; var bestD = Double.MaxValue
      cents.indices.foreach { c =>
        var dot = 0.0; var cc = 0.0; var i = 0
        while (i < v.length) {
          dot += v(i) * cents(c)(i); cc += cents(c)(i) * cents(c)(i); i += 1
        }
        val d = cc - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val blockCents = (0 until 4).map { b =>
      def blk(v: Seq[Double]): Array[Double] =
        v.slice(b * 16, b * 16 + 16).toArray
      var cents: IndexedSeq[Array[Double]] =
        (0 until 16).map(i => blk(byId(i.toLong * n / 16)))
      (1 to 2).foreach { _ =>
        val sums = Array.fill(16)(new Array[Double](16))
        val cnts = new Array[Long](16)
        vecs.foreach { case (_, v) =>
          val bv = blk(v); val c = argmin(cents, bv)
          (0 until 16).foreach(i => sums(c)(i) += bv(i)); cnts(c) += 1
        }
        cents = cents.indices.map(c =>
          if (cnts(c) == 0) cents(c)
          else sums(c).map(x => roundDp(x / cnts(c))))
      }
      cents
    }
    val exp = vecs.map { case (id, v) =>
      (id, (0 until 4).map(b =>
        argmin(blockCents(b), v.slice(b * 16, b * 16 + 16).toArray).toLong))
    }.map { case (id, cs) => (id, cs(0), cs(1), cs(2), cs(3)) }.toSet
    val got = SparkEntry.queries("q75_pq_codes")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === exp)
    assert(got.flatMap(r => Seq(r._2, r._3, r._4, r._5)).forall(c =>
      c >= 0 && c < 16))
  }

  test("q76: IVF-PQ ADC query equals a plain-Scala recompute (train, " +
    "code, LUT-sum, top-50 cut, exact re-rank)") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val n = vecs.length.toLong
    val byId = vecs.toMap
    def roundDp(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sdot(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def argmin(cents: IndexedSeq[Seq[Double]], v: Seq[Double]): Int = {
      var best = -1; var bestD = Double.MaxValue
      cents.indices.foreach { c =>
        val d = sdot(cents(c), cents(c)) - 2.0 * sdot(v, cents(c))
        if (d < bestD) { bestD = d; best = c }
      }
      best
    }
    val blockCents = (0 until 4).map { b =>
      def blk(v: Seq[Double]): Seq[Double] = v.slice(b * 16, b * 16 + 16)
      var cents: IndexedSeq[Seq[Double]] =
        (0 until 16).map(i => blk(byId(i.toLong * n / 16)))
      (1 to 2).foreach { _ =>
        val sums = Array.fill(16)(new Array[Double](16))
        val cnts = new Array[Long](16)
        vecs.foreach { case (_, v) =>
          val bv = blk(v); val c = argmin(cents, bv)
          (0 until 16).foreach(i => sums(c)(i) += bv(i)); cnts(c) += 1
        }
        cents = cents.indices.map(c =>
          if (cnts(c) == 0) cents(c)
          else sums(c).map(x => roundDp(x / cnts(c))).toSeq)
      }
      cents
    }
    val qv = byId(0L)
    val luts = (0 until 4).map { b =>
      val qb = qv.slice(b * 16, b * 16 + 16)
      blockCents(b).map(cv => sdot(cv, cv) - 2.0 * sdot(qb, cv))
    }
    val exp = vecs.map { case (id, v) =>
      val adc = (0 until 4).map(b =>
        luts(b)(argmin(blockCents(b), v.slice(b * 16, b * 16 + 16))))
        .reduce(_ + _)
      (id, v, adc)
    }.sortBy(r => (r._3, r._1)).take(50)
      .map { case (id, v, _) =>
        (id, sdot(v, qv) / (math.sqrt(sdot(v, v)) * math.sqrt(sdot(qv, qv))))
      }.sortBy(r => (-r._2, r._1)).take(10)
    val got = SparkEntry.queries("q76_ivfpq_adc")(spark, dir)
      .as[(Long, Double)].collect().toSeq
    assert(got === exp)
    assert(got.size === 10 && got.head._1 === 0L,
      "the query vector itself should top the re-ranked list")
  }

  test("q74: BPE merge candidates equal a brute-force adjacent-pair " +
    "count with the (count desc, pair asc) total order") {
    import spark.implicits._
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"text").as[String].collect()
      .foreach { tx =>
        tx.split(" ", -1).foreach { w =>
          var i = 0
          while (i < w.length - 1) {
            val p = w.substring(i, i + 2)
            counts.update(p, counts.getOrElse(p, 0L) + 1L)
            i += 1
          }
        }
      }
    val exp = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(100)
    val got = SparkEntry.queries("q74_bpe_merges")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got === exp)
    assert(got.size === math.min(100, counts.size) && got.nonEmpty)
  }

  test("DSIR analytic properties: target ≡ raw gives all-zero weights " +
    "with full shared support; selection is run-to-run deterministic") {
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.functions.{greatest, length, lit}
    // a corpus whose every document is in the target slice trains
    // identical target and raw models — every delta is exactly 0, so
    // every weight is exactly 0 and the shared support is the doc's
    // whole trigram stream (integer-exact, no float residue)
    val tmp = Files.createTempDirectory("graft-dsir-prop").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("lang", lit("en"))
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val w = SparkEntry.queries("q80_dsir_weights")(spark, tmp)
      .as[(Long, Long, Long)].collect()
    assert(w.forall(_._3 == 0L), "identical models produced nonzero weights")
    val triCount = spark.read.parquet(s"$tmp/documents.parquet")
      .select($"doc_id",
        greatest(length($"text") - 2, lit(0)).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    w.foreach { case (id, nShared, _) =>
      assert(nShared === triCount(id),
        s"doc $id shared support $nShared != trigram count ${triCount(id)}")
    }
    // determinism: the Gumbel keys are pure hash functions of doc_id,
    // so two runs select the same documents in the same order
    val s1 = SparkEntry.queries("q81_dsir_select")(spark, dir).collect().toSeq
    val s2 = SparkEntry.queries("q81_dsir_select")(spark, dir).collect().toSeq
    assert(s1 === s2, "selection not deterministic across runs")
    TextOps.invalidateDir(tmp)
  }

  test("BpeStore attach routes q77/q78's merge training through the " +
    "persisted list — tokenizer versions survive a corpus rewrite") {
    import spark.implicits._
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-bpe-att").toString
    spark.read.parquet(s"$dir/documents.parquet").coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    val store = Files.createTempDirectory("graft-bpe-store").toString
    // train DEEPER than q77's 10 steps: the list is prefix-stable, so
    // the store must serve the shallower request as take(10)
    BpeStore.build(spark, tmp, store, n = 12)
    val fresh = SparkEntry.queries("q77_bpe_train")(spark, tmp)
      .collect().toSeq
    BpeStore.attach(tmp, store)
    try {
      assert(SparkEntry.queries("q77_bpe_train")(spark, tmp)
        .collect().toSeq === fresh)
      // rewrite the corpus UNDER the attach: a pinned tokenizer
      // version keeps serving — training is per refresh, not per query
      (1L to 50L).map(i => (i, "zz zz zz qqq qqq", "en", "web"))
        .toDF("doc_id", "text", "lang", "source")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      assert(SparkEntry.queries("q77_bpe_train")(spark, tmp)
        .collect().toSeq === fresh,
        "attached q77 retrained on the rewritten corpus")
    } finally BpeStore.detach(tmp)
    // detached again: the next call re-fingerprints the documents and
    // genuinely retrains — the garbage corpus trains different merges
    val retrained = SparkEntry.queries("q77_bpe_train")(spark, tmp)
      .collect().toSeq
    assert(retrained !== fresh, "detach did not restore in-query training")
  }

  test("q77: iterative BPE training equals a plain-Scala reference fold " +
    "(greedy leftmost merge application, (count desc, pair asc) selection)") {
    import spark.implicits._
    val freq = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"text").as[String].collect()
      .foreach(_.split(" ", -1).filter(_.length >= 2)
        .foreach(w => freq.update(w, freq.getOrElse(w, 0L) + 1L)))
    var vocab: Seq[(Vector[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    for (step <- 1 to 10) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      val ((a, b), c) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x + " " + y) }.head
      expected += ((step.toLong, s"$a $b", a + b, c))
      vocab = vocab.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2 // greedy leftmost, scan continues after
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }
    }
    val got = SparkEntry.queries("q77_bpe_train")(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === expected.toSeq)
    // the trained list must COMPOSE: some later merge consumes an
    // earlier merged symbol (multi-char side), or the corpus is too
    // degenerate for the test to mean anything
    assert(got.exists { case (_, pair, _, _) =>
      pair.split(" ", 2).exists(_.length > 1) })
  }

  test("q78: trained-tokenizer encode equals a plain-Scala apply of the " +
    "reference merge list (and is never coarser than chars or finer than words)") {
    import spark.implicits._
    // reference merges — the same fold the q77 golden validates
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    docs.foreach(_._2.split(" ", -1).filter(_.length >= 2)
      .foreach(w => freq.update(w, freq.getOrElse(w, 0L) + 1L)))
    var vocab: Seq[(Vector[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to 10) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      val ((a, b), _) = counts.toSeq
        .sortBy { case ((x, y), n) => (-n, x + " " + y) }.head
      merges += ((a, b))
      vocab = vocab.map { case (syms, f) => (applyMerge(syms, a, b), f) }
    }
    // reference encode: every word (incl. single-char words the
    // training vocab excludes), merges applied in training order
    val expected = docs.map { case (id, text) =>
      val words = text.split(" ", -1).filter(_.nonEmpty)
      val toks = words.map { w =>
        merges.foldLeft(w.map(_.toString).toVector) {
          case (syms, (a, b)) => applyMerge(syms, a, b)
        }.length.toLong
      }.sum
      (id, toks, words.length.toLong)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q78_bpe_encode")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // sanity bounds: tokens never exceed chars-per-word sum, never
    // fall below word count, and SOME doc actually compressed
    assert(got.forall { case (_, t, w) => t >= w })
    assert(got.exists { case (id, t, _) =>
      t < docs.find(_._1 == id).get._2.count(_ != ' ') })
  }

  test("q79: trigram-LM scores equal a plain-Scala recompute " +
    "(exact integer micro-nats, order-free)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def trigrams(t: String): Seq[String] =
      if (t.length < 3) Nil else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val cnt3 = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) =>
      trigrams(t).foreach(g => cnt3.update(g, cnt3.getOrElse(g, 0L) + 1L))
    }
    val cnt2 = cnt3.groupBy(_._1.substring(0, 2)).map { case (b, m) =>
      b -> m.values.sum
    }
    def micro(g: String): Long =
      BigDecimal(math.log(cnt3(g).toDouble / cnt2(g.substring(0, 2)).toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = docs.map { case (id, t) =>
      val gs = trigrams(t)
      (id, gs.length.toLong, gs.map(micro).sum)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q79_charlm_score")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // log-probs are non-positive; a corpus-trained LM must separate
    // documents (not everything scores identically per trigram)
    assert(got.forall(_._3 <= 0L))
    val avgs = got.filter(_._2 > 0).map(r => r._3.toDouble / r._2)
    assert(avgs.max - avgs.min > 1e5,
      "no per-doc separation — the score is degenerate")
  }

  test("q73: substring scrub equals a brute-force recompute; canonical " +
    "copies and untouched docs keep their exact text") {
    import spark.implicits._
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val wordsOf = docs.map { case (id, tx) => id -> tx.split(" ", -1) }.toMap
    def sgOf(ws: Array[String], i: Int): Long = java.lang.Long.parseLong(
      md5hex(ws.slice(i - 1, i - 1 + 13).mkString(" ")).take(12), 16)
    val occ = for {
      (id, ws) <- wordsOf.toSeq
      i <- 1 to math.max(ws.length - 12, 1)
    } yield (id, i, sgOf(ws, i))
    val keeper = occ.groupBy(_._3).collect {
      case (sg, os) if { val d = os.map(_._1).distinct; d.size >= 2 && d.size <= 512 } =>
        sg -> os.map(_._1).min
    }
    val rem = occ.filter(o => keeper.get(o._3).exists(_ != o._1))
      .flatMap(o => (o._2 until o._2 + 13).map(p => (o._1, p.toLong)))
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    val exp = docs.map { case (id, _) =>
      val ws = wordsOf(id)
      val cut = rem.getOrElse(id, Set.empty[Long])
      val kept = ws.zipWithIndex.collect { case (w, p) if !cut(p + 1L) => w }
      (id, ws.length.toLong, (ws.length - kept.length).toLong,
        md5hex(kept.mkString(" ")))
    }.toSet
    val got = SparkEntry.queries("q73_substring_scrub")(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got === exp)
    val scrubbed = got.filter(_._3 > 0)
    assert(scrubbed.nonEmpty, "fixture should contain duplicated passages")
    // untouched docs carry the fingerprint of their original text
    assert(got.filter(_._3 == 0).forall { case (id, _, _, h) =>
      h == md5hex(wordsOf(id).mkString(" ")) })
  }

  test("q71: an oversized interleaved doc occupies its own window " +
    "(the atomic-overflow branch the sf fixture never reaches)") {
    import spark.implicits._
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-q71big").toString
    val big = (1 to 3000).map(i => s"w$i").mkString(" ")
    val small = (1 to 10).map(i => s"s$i").mkString(" ")
    Seq((1L, big), (2L, small), (3L, small), (4L, big), (5L, small))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q71_interleaved_pack")(spark, tmp)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._3).sorted === Array(1L, 2L, 3L, 4L, 5L))
    val oversized = got.filter(_._6 > 2048L)
    assert(oversized.length === 2, "both big docs must exceed capacity")
    val byWin = got.groupBy(r => (r._1, r._2))
    oversized.foreach { r =>
      assert(byWin((r._1, r._2)).length === 1,
        s"oversized doc ${r._3} shares a window")
      // its window closes at exactly its own cost
      assert(r._7 === r._6)
    }
  }

  test("q70: simhash Hamming pairs equal a brute-force all-pairs scan " +
    "(the 4x16-bit pigeonhole gate is exact for distance <= 3)") {
    import spark.implicits._
    // independent reference: 64-bit md5 simhash per doc in plain Scala
    def simhash(text: String): Long = {
      val votes = new Array[Int](64)
      text.split(" ", -1).foreach { tk =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(tk.getBytes("UTF-8"))
        def word(off: Int): Int =
          ((d(off) & 0xFF) << 24) | ((d(off + 1) & 0xFF) << 16) |
            ((d(off + 2) & 0xFF) << 8) | (d(off + 3) & 0xFF)
        val (h0, h1) = (word(0), word(4))
        (0 until 32).foreach { b =>
          votes(b) += (if (((h0 >> b) & 1) == 1) 1 else -1)
          votes(32 + b) += (if (((h1 >> b) & 1) == 1) 1 else -1)
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sh = docs.map { case (id, tx) => id -> simhash(tx) }
    val exp = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      d = java.lang.Long.bitCount(sa ^ sb) if d <= 3
    } yield (a, b) -> d.toLong).toMap
    val got = SparkEntry.queries("q70_simhash_neardup")(spark, dir)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === exp)
    assert(exp.nonEmpty, "fixture should contain simhash near-dups")
  }

  test("q68: funnel steps equal a per-user brute-force event scan") {
    import java.time.LocalDateTime
    // events read as TIMESTAMP_NTZ → LocalDateTime; normalize both sides
    def ldt(a: Any): LocalDateTime = a match {
      case t: java.sql.Timestamp => t.toLocalDateTime
      case l: LocalDateTime => l
    }
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), ldt(r.get(2)), r.getString(3)))
    val exp = events.groupBy(_._1).map { case (u, evs) =>
      val ordered = evs.sortWith((a, b) =>
        a._3.compareTo(b._3) < 0 || (a._3.compareTo(b._3) == 0 && a._2 < b._2))
      def within24h(t: LocalDateTime, from: LocalDateTime) =
        t.isAfter(from) && !t.isAfter(from.plusHours(24))
      val tView = ordered.collectFirst { case e if e._4 == "view" => e._3 }
      val tClick = tView.flatMap(v => ordered.collectFirst {
        case e if e._4 == "click" && within24h(e._3, v) => e._3 })
      val tPurchase = tClick.flatMap(c => ordered.collectFirst {
        case e if e._4 == "purchase" && within24h(e._3, c) => e._3 })
      val step: Long =
        if (tPurchase.isDefined) 3L else if (tClick.isDefined) 2L
        else if (tView.isDefined) 1L else 0L
      u -> ((tView, tClick, tPurchase, step))
    }
    val got = SparkEntry.queries("q68_funnel")(spark, dir).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val u = r.getLong(0)
      val (tv, tc, tp, step) = exp(u)
      assert(Option(r.get(1)).map(ldt) === tv, s"user $u t_view")
      assert(Option(r.get(2)).map(ldt) === tc, s"user $u t_click")
      assert(Option(r.get(3)).map(ldt) === tp, s"user $u t_purchase")
      assert(r.getLong(4) === step, s"user $u step")
    }
    // the fixture must exercise more than one funnel depth
    assert(got.map(_.getLong(4)).distinct.length >= 2,
      "funnel depths are degenerate at this scale")
  }

  test("q57: flagged set is an LSH-gated subset of the brute-force semantic " +
    "hits; benchmark rows never appear in the output") {
    import spark.implicits._
    val out = SparkEntry.queries("q57_semantic_decontam")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    assert(out.forall(_._1 % 19 != 0), "a benchmark row leaked into the output")
    out.foreach { case (id, n, c) => assert(c === (n >= 1L), s"vec $id flags") }
    // brute force at the same floor, same sequential-fold arithmetic
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val bench = emb.filter(_._1 % 19 == 0)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = emb.filter(_._1 % 19 != 0)
      .filter { case (_, v) => bench.exists(b => cos(v, b._2) >= 0.4) }
      .map(_._1).toSet
    val flagged = out.filter(_._3).map(_._1).toSet
    assert(flagged.subsetOf(brute),
      s"LSH gate flagged vectors brute force does not: ${flagged -- brute}")
    assert(flagged.nonEmpty, "gate found nothing at this scale")
    // and the output covers the whole corpus side exactly once
    assert(out.length === emb.count(_._1 % 19 != 0))
  }

  test("q60: the leakage report is q57 read from the benchmark side — " +
    "total hits agree, leaked items are exactly the hit benchmark ids") {
    import spark.implicits._
    val corpusView = SparkEntry.queries("q57_semantic_decontam")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    val benchView = SparkEntry.queries("q60_benchmark_leakage")(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    // one row per benchmark item, benchmark ids only
    assert(benchView.forall(_._1 % 19 == 0), "non-benchmark id in the report")
    val nBench = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" % 19 === 0).count()
    assert(benchView.length.toLong === nBench)
    // both reports count the SAME qualifying (corpus, benchmark) pairs
    assert(benchView.map(_._2).sum === corpusView.map(_._2).sum,
      "hit totals disagree between the corpus and benchmark views")
    benchView.foreach { case (id, n, leaked) =>
      assert(leaked === (n >= 1L), s"bvec $id flag")
    }
    assert(benchView.exists(_._3), "no leakage found at this scale")
  }

  test("every query runs at sf0.001 and returns a stable schema") {
    // broadcast-scalar whitelist: crossJoin(broadcast(<one-row agg>))
    // plans as a BroadcastNestedLoopJoin but is O(n×1) — the canonical
    // shape for corpus-constant state riding the plan (q29's query
    // vector; q65's group sizing and q66's weight totals since the
    // round-7 lazy-construction fix). Everything else must be free of
    // quadratic join operators at EVERY data size (the 100 TB guard).
    val crossJoinWhitelist =
      Set("q29_cosine_topk", "q65_curriculum", "q66_temperature_mix")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      // non-degenerate except the intentionally-filtered ones
      if (!Set("q30_embed_neardup", "q25_ngram_jaccard").contains(name))
        assert(n > 0, s"$name returned 0 rows at sf0.001")
      if (!crossJoinWhitelist.contains(name)) {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"),
          s"$name contains a CartesianProduct")
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name contains a BroadcastNestedLoopJoin")
      }
    }
  }

  test("LSH skew valve: over-populated buckets are dropped, normal ones pair up") {
    import spark.implicits._
    import graft.operators.TextOps
    val text = "the same boilerplate paragraph repeated verbatim on every page " * 4
    // 600 byte-identical docs: every band bucket holds 600 > MaxLshBucket
    // -> the valve drops them all, no quadratic within-bucket join
    val big = java.nio.file.Files.createTempDirectory("graft-lsh-big").toString
    (0L until 600L).map((_, text)).toDF("doc_id", "text")
      .write.parquet(s"$big/documents.parquet")
    assert(600 > TextOps.MaxLshBucket)
    assert(TextOps.lshCandidatePairs(spark, big).count() === 0L)
    // 100 identical docs fit under the cap -> the full clique of pairs
    val small = java.nio.file.Files.createTempDirectory("graft-lsh-small").toString
    (0L until 100L).map((_, text)).toDF("doc_id", "text")
      .write.parquet(s"$small/documents.parquet")
    assert(TextOps.lshCandidatePairs(spark, small).count() === 100L * 99 / 2)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("queries are deterministic across runs") {
    for (name <- Seq("q24_minhash_lsh", "q29_cosine_topk", "q17_host_dequeue")) {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, dir).collect().map(_.toString).toSeq
      val b = fn(spark, dir).collect().map(_.toString).toSeq
      assert(a === b, s"$name nondeterministic")
    }
  }

  test("simhash: identical token lists agree; near-identical differ little") {
    val t1 = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val h1 = TextOps.simhash(t1)
    assert(h1 === TextOps.simhash(t1))
    val h2 = TextOps.simhash(t1 :+ "eta")
    val hamming = java.lang.Long.bitCount(h1 ^ h2)
    assert(hamming <= 24, s"near-dup hamming too large: $hamming")
    val h3 = TextOps.simhash(Seq("x1", "x2", "x3", "x4", "x5", "x6"))
    assert(java.lang.Long.bitCount(h1 ^ h3) > hamming)
  }

  test("rolling hash: deterministic, order-sensitive, in [0, 2^61)") {
    val a = TextOps.rollingHash("hello world")
    assert(a === TextOps.rollingHash("hello world"))
    assert(a !== TextOps.rollingHash("world hello"))
    assert(a >= 0 && a < (1L << 61))
  }

  test("ANN LSH (multiprobe): recall@10 vs brute force >= 0.9") {
    import org.apache.spark.sql.functions._
    val brute = VectorOps.queries("q29_cosine_topk")(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).take(10).toSet
    val ann = VectorOps.queries("q31_ann_lsh")(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (brute & ann).size.toDouble / 10
    assert(recall >= 0.9, s"recall@10 too low: $recall (ann=$ann)")
  }

  test("ANN IVF (trained): recall@10 vs brute force >= 0.9 at sf0.01") {
    // measured on the correctness-gate corpus (sf0.01, same scale the
    // driver oracles at); sf0.001's vectors are pure noise where the
    // true top-10 straddles cells for ANY coarse quantizer
    import org.apache.spark.sql.functions._
    val d01 = "/root/testdata/sf0.01"
    val brute = VectorOps.queries("q29_cosine_topk")(spark, d01)
      .select(col("vec_id")).collect().map(_.getLong(0)).take(10).toSet
    val ivf = VectorOps.queries("q36_ann_ivf")(spark, d01)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val recall = (brute & ivf).size.toDouble / 10
    assert(recall >= 0.9, s"recall@10 too low: $recall (ivf=$ivf)")
  }

  test("sign-band LSH: planted near-duplicates (cos >= 0.9) always collide") {
    // near-dup detection operates at high cosine; plant near-dups by
    // mixing real corpus vectors (v, 0.97v + 0.03w) and assert that
    // every planted pair with cos >= 0.9 shares at least one band
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("embedding").limit(200).collect()
      .map(_.getSeq[Float](0).toArray)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.indices.map(i => a(i).toDouble * b(i)).sum
      d / math.sqrt(a.map(x => x * x.toDouble).sum) /
        math.sqrt(b.map(x => x * x.toDouble).sum)
    }
    var planted = 0
    (0 until 200 by 2).foreach { i =>
      val v = emb(i)
      val w = emb(i + 1)
      val nd = v.indices.map(k => 0.97f * v(k) + 0.03f * w(k)).toArray
      if (cos(v, nd) >= 0.9) {
        planted += 1
        val ca = VectorOps.signChunksOf(v.toSeq)
        val cb = VectorOps.signChunksOf(nd.toSeq)
        assert(ca.indices.exists(b => ca(b) == cb(b)),
          s"planted near-dup pair $i missed by all bands")
      }
    }
    assert(planted >= 50, s"too few planted high-cos pairs: $planted")
  }

  test("ANN IVF: returns 10 rows and the query vector itself tops the list") {
    import org.apache.spark.sql.functions._
    val rows = VectorOps.queries("q36_ann_ivf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length === 10)
    assert(rows.head._1 === 0L) // vec 0 matches itself, cos ~ 1
    assert(rows.head._2 > 0.999)
  }

  test("charset sniffer: BOMs, content-type, meta, fallback") {
    import graft.core.CharsetSniffer
    import java.nio.charset.StandardCharsets._
    assert(CharsetSniffer.sniff("plain ascii".getBytes(UTF_8)) === UTF_8)
    assert(CharsetSniffer.sniff(Array(0xEF, 0xBB, 0xBF, 'a').map(_.toByte)) === UTF_8)
    assert(CharsetSniffer.sniff("x".getBytes(UTF_8), Some("text/html; charset=ISO-8859-1")) === ISO_8859_1)
    assert(CharsetSniffer.sniff(
      "<html><meta charset=\"utf-8\"></html>".getBytes(UTF_8)) === UTF_8)
    val latin1 = Array(0xE9, 0x20, 0xE8).map(_.toByte) // invalid UTF-8
    assert(CharsetSniffer.sniff(latin1) === ISO_8859_1)
    assert(CharsetSniffer.decode(latin1) === "é è")
    assert(CharsetSniffer.decode("héllo wörld".getBytes(UTF_8)) === "héllo wörld")
  }

  test("stub decoder: deterministic metadata and frame sampling") {
    val payload = "abcdefghijklmnopqrstuvwxyz0123456789".getBytes("UTF-8")
    val dec = new MultimodalOps.StubDecoder
    val m = dec.decode(payload)
    assert(m.n_bytes === payload.length.toLong)
    assert(m === dec.decode(payload))
    val frames = dec.sampleFrames(payload, 16)
    assert(frames.map(_._1) === Seq(0, 1, 2))
    assert(frames(1)._2 === payload(16).toInt)
  }

  test("multimodal fixture contract: documents.text is pure ASCII (the byte " +
    "arithmetic the q32/q33/q48/q49 oracles share)") {
    import spark.implicits._
    val nonAscii = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(org.apache.spark.sql.functions.length($"text") !==
        org.apache.spark.sql.functions.octet_length($"text"))
      .count()
    assert(nonAscii === 0L,
      "corpus gained non-ASCII text: the multimodal oracles' ord()/ascii() " +
        "byte arithmetic no longer matches UTF-8 payload bytes")
  }

  test("capped_sorted_set: exact sorted set under the cap, NULL past it, " +
    "O(cap) buffer via overflow collapse") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val df = (0L until 2000L).map(i => (if (i < 1800) "big" else "small", i % 600))
      .toDF("g", "v")
      .repartition(8) // force partial buffers + merges
      .groupBy($"g").agg(TextOps.cappedSortedSet($"v", 512).as("ids"))
    val rows = df.collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(rows("big").isEmpty, "600 distinct values > cap 512 must be NULL")
    val small = rows("small").get
    assert(small === small.sorted && small.toSet === (1800L until 2000L).map(_ % 600).toSet)
  }

  test("capped_dup_occurrences: non-keeper occurrences under the cap, NULL " +
    "for singleton and over-cap groups, partial merges forced") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.RetrievalOps
    // "dup": docs {1,2,3}, keeper 1 — expect the non-keeper pairs only;
    // "single": one distinct doc -> NULL; "big": 600 distinct docs > cap -> NULL
    val rows =
      Seq(("dup", 1L, 10L), ("dup", 2L, 20L), ("dup", 2L, 21L), ("dup", 3L, 30L),
        ("single", 7L, 70L), ("single", 7L, 71L)) ++
        (0L until 600L).map(i => ("big", i, i * 2))
    val out = rows.toDF("g", "d", "p")
      .repartition(8) // force partial buffers + merges
      .groupBy($"g")
      .agg(RetrievalOps.cappedDupOccurrences($"d", $"p", 512).as("occ"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.getSeq[org.apache.spark.sql.Row](1))).toMap
    assert(out("single").isEmpty, "singleton group must be NULL")
    assert(out("big").isEmpty, "600 distinct docs > cap 512 must be NULL")
    val dup = out("dup").get.map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(dup === Seq((2L, 20L), (2L, 21L), (3L, 30L)))
  }

  test("stub decoder: resize fits the box preserving aspect; features recompute") {
    val dec = new MultimodalOps.StubDecoder
    val payload = "some synthetic media payload bytes 0123".getBytes("UTF-8")
    val m = dec.decode(payload)
    val (dw, dh) = dec.resizeBox(payload, MultimodalOps.ResizeBox)
    val mx = math.max(m.width, m.height)
    assert(dw === m.width * MultimodalOps.ResizeBox / mx)
    assert(dh === m.height * MultimodalOps.ResizeBox / mx)
    assert(math.max(dw, dh) === MultimodalOps.ResizeBox) // long side hits the box
    assert(dw <= MultimodalOps.ResizeBox && dh <= MultimodalOps.ResizeBox)
    val (n, mean, mxb, dist) = dec.features(payload)
    assert(n === payload.length.toLong)
    assert(mean === payload.map(_ & 0xff).map(_.toLong).sum / payload.length)
    assert(mxb === payload.map(_ & 0xff).max.toLong)
    assert(dist === payload.map(_ & 0xff).distinct.length.toLong)
    // empty payload is total
    assert(dec.features(Array.emptyByteArray) === ((0L, 0L, 0L, 0L)))
  }

  test("Decoder seam: per-partition lifecycle, closed even on early termination") {
    import MultimodalOps._
    val sp = spark
    import sp.implicits._
    val opened = spark.sparkContext.longAccumulator("dec_opened")
    val closed = spark.sparkContext.longAccumulator("dec_closed")
    final class Counting extends Decoder {
      opened.add(1)
      private val inner = new StubDecoder
      def decode(p: Array[Byte]): DecodedMeta = inner.decode(p)
      def sampleFrames(p: Array[Byte], s: Int): Seq[(Int, Int)] =
        inner.sampleFrames(p, s)
      override def close(): Unit = closed.add(1)
    }
    val rows = (0L until 40L).map(i => MediaRow(i, s"payload-$i".getBytes("UTF-8")))
    val ds = spark.createDataset(rows).repartition(4)
    def decoded = ds.mapPartitions { it =>
      Decoder.decodePartition(it, () => new Counting) { (dec, m) =>
        MediaMeta(m.doc_id, dec.decode(m.payload).n_bytes, 0L, 0L, "x")
      }
    }
    // full drain: one decoder per non-empty partition, every one closed
    assert(decoded.collect().length === 40)
    assert(opened.value === closed.value && opened.value >= 1)
    // early termination (limit): the TaskCompletionListener still closes
    val (o0, c0) = (opened.value, closed.value)
    assert(decoded.limit(3).collect().length === 3)
    assert(opened.value > o0, "limit run should open at least one decoder")
    assert(opened.value === closed.value,
      s"decoder leak under early termination: opened=${opened.value} closed=${closed.value}")
  }
}
