package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Semantics tests for the round-6 operators: the interleaved span
  * derivation (q61/q62), BM25 (q63), exact-substring overlap (q64),
  * curriculum epochs (q65), temperature mixing (q66), and int8
  * quantization (q67). Reference implementations are independent
  * in-memory Scala computations over the same parquet — hash-level
  * DuckDB equality is the driver's job. */
class InterleavedOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def docs(): Array[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
  }

  /** The q61 contract, recomputed row-locally in plain Scala. */
  private def refSpans(docId: Long, text: String): Seq[(String, String, String)] = {
    val words = text.split(" ", -1)
    val nch = (words.length + 7) / 8
    (0 until nch).flatMap { i =>
      val chunk = words.slice(i * 8, i * 8 + 8).mkString(" ")
      val textSpan = ("text", chunk, null: String)
      if ((docId * 31 + i) % 4 == 0)
        Seq(textSpan, ("media", null: String, s"media://blob/${(docId * 31 + i) % 997}"))
      else Seq(textSpan)
    }
  }

  test("q61 (spanArrays): span arrays equal the row-local reference " +
    "(kind/text/media_ref/offset) with span/media telemetry") {
    val out = graft.operators.InterleavedOps.spanArrays(spark, dir).collect()
    val ref = docs().map { case (id, tx) => id -> refSpans(id, tx) }.toMap
    assert(out.length === ref.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val spans = r.getSeq[Row](1)
      val exp = ref(id)
      assert(spans.length === exp.length, s"doc $id span count")
      spans.zipWithIndex.foreach { case (sp, p) =>
        val (k, tx, mr) = exp(p)
        assert(sp.getString(0) === k, s"doc $id span $p kind")
        assert(sp.getString(1) === tx, s"doc $id span $p text")
        assert(sp.getString(2) === mr, s"doc $id span $p media_ref")
        assert(sp.getInt(3) === p, s"doc $id span $p offset")
      }
      assert(r.getLong(2) === exp.length.toLong)
      assert(r.getLong(3) === exp.count(_._1 == "media").toLong)
    }
  }

  test("q61 gate query: one scalar row per span, the exact explosion of " +
    "the span arrays") {
    import spark.implicits._
    val flat = SparkEntry.queries("q61_spanize")(spark, dir)
      .as[(Long, Int, String, Option[String], Option[String])].collect()
    val ref = docs().map { case (id, tx) => id -> refSpans(id, tx) }.toMap
    assert(flat.length === ref.values.map(_.size).sum)
    flat.groupBy(_._1).foreach { case (id, rows) =>
      val exp = ref(id)
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq === exp.indices.toSeq, s"doc $id offsets")
      ordered.zip(exp).foreach { case ((_, _, k, tx, mr), (ek, etx, emr)) =>
        assert(k === ek, s"doc $id kind")
        assert(tx === Option(etx), s"doc $id text")
        assert(mr === Option(emr), s"doc $id media_ref")
      }
    }
  }

  test("q62: media dedup agrees with the flattened reference spans") {
    val refs = docs().flatMap { case (id, tx) =>
      refSpans(id, tx).collect { case ("media", _, mr) => (mr, id) }
    }
    val exp = refs.groupBy(_._1).map { case (mr, xs) =>
      mr -> (xs.length.toLong, xs.map(_._2).distinct.length.toLong, xs.map(_._2).min)
    }
    val out = SparkEntry.queries("q62_media_dedup")(spark, dir).collect()
    assert(out.length === exp.size)
    out.foreach { r =>
      val (nRefs, nDocs, keeper) = exp(r.getString(0))
      assert(r.getLong(1) === nRefs)
      assert(r.getLong(2) === nDocs)
      assert(r.getLong(3) === keeper)
      assert(r.getBoolean(4) === (nDocs > 1))
    }
    // the dedup keeps exactly one document per duplicated blob
    assert(out.count(_.getBoolean(4)) > 0, "fixture should contain shared blobs")
  }

  test("spanizeDocs bridges to the engine Doc model; SpanCodec round-trips the spans") {
    import graft.functions.SpanCodec
    val docs = graft.operators.InterleavedOps.spanizeDocs(spark, dir).collect()
    assert(docs.nonEmpty)
    assert(docs.exists(_.spans.exists(_.kind == "media")))
    docs.foreach { d =>
      // the derived spans satisfy the engine's Span invariants
      d.spans.zipWithIndex.foreach { case (sp, p) =>
        assert(sp.offset === p)
        assert((sp.kind == "text" && sp.text != null && sp.media_ref == null) ||
          (sp.kind == "media" && sp.text == null && sp.media_ref != null))
      }
      // packed-storage round trip (the engine's packedSpans write path)
      val packed = SpanCodec.pack(d.spans)
      val back = SpanCodec.unpackRows(packed)
      assert(back.numElements() === d.spans.length)
      d.spans.zipWithIndex.foreach { case (sp, p) =>
        val row = back.getStruct(p, 4)
        assert(row.getUTF8String(0).toString === sp.kind)
        val payload = if (sp.kind == "text") sp.text else sp.media_ref
        val got = if (sp.kind == "text") row.getUTF8String(1) else row.getUTF8String(2)
        assert(got.toString === payload, s"doc ${d.doc_id} span $p")
        assert(row.getInt(3) === p)
      }
    }
  }

  test("q63: BM25 matches a scalar reference implementation") {
    val terms = Seq("join", "window", "scan")
    val all = docs().map { case (id, tx) => (id, tx.split(" ", -1)) }
    val n = all.length.toDouble
    val avgdl = all.map(_._2.length.toLong).sum.toDouble / n
    val dfs = terms.map(t => t -> all.count(_._2.contains(t)).toDouble).toMap
    val exp = all.flatMap { case (id, ws) =>
      val tfs = terms.map(t => t -> ws.count(_ == t).toLong).toMap
      if (tfs.values.sum == 0) None
      else {
        val dl = ws.length.toDouble
        val score = terms.map { t =>
          val tf = tfs(t).toDouble
          val df = dfs(t)
          math.log(1 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }.sum
        Some(id -> (tfs, score))
      }
    }.toMap
    val out = SparkEntry.queries("q63_bm25")(spark, dir).collect()
    assert(out.length === exp.size)
    out.foreach { r =>
      val id = r.getLong(0)
      val (tfs, score) = exp(id)
      assert(r.getLong(2) === tfs("join"), s"doc $id tf_join")
      assert(r.getLong(3) === tfs("window"))
      assert(r.getLong(4) === tfs("scan"))
      assert(math.abs(r.getDouble(5) - score) < 1e-5, s"doc $id bm25")
    }
  }

  test("q64: shared 13-gram pairs equal a brute-force shingle index") {
    val sh = docs().map { case (id, tx) =>
      val ws = tx.split(" ", -1)
      val upper = math.max(ws.length - 12, 1)
      id -> (1 to upper).map(i => ws.slice(i - 1, i - 1 + 13).mkString(" ")).toSet
    }
    val exp = scala.collection.mutable.Map[(Long, Long), Long]()
    val byShingle = sh.flatMap { case (id, set) => set.map(_ -> id) }
      .groupBy(_._1).map { case (sg, xs) => sg -> xs.map(_._2).sorted }
    byShingle.values.filter(ds => ds.length >= 2 && ds.length <= 512).foreach { ds =>
      for (a <- ds; b <- ds if a < b)
        exp((a, b)) = exp.getOrElse((a, b), 0L) + 1L
    }
    val out = SparkEntry.queries("q64_substring_dedup")(spark, dir).collect()
    assert(out.map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap === exp.toMap)
  }

  test("q65: epochs are a 4-quantile partition ordered by the integer key") {
    val out = SparkEntry.queries("q65_curriculum")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet.size === out.length)
    assert(out.map(_._3).toSet === Set(1L, 2L, 3L, 4L))
    // epoch sizes differ by at most one; epoch boundaries respect key order
    val sizes = out.groupBy(_._3).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1)
    val sorted = out.sortBy(x => (x._2, x._1))
    assert(sorted.map(_._3).toSeq === sorted.map(_._3).sorted.toSeq)
  }

  test("q66: temperature weights flatten the language mix and conserve budget") {
    import spark.implicits._
    val out = SparkEntry.queries("q66_temperature_mix")(spark, dir)
      .as[(String, Long, Long, Double, Long)].collect()
    val total = out.map(_._2).sum
    out.foreach { case (_, n, wgt, rate, _) =>
      assert(wgt === math.sqrt(n.toDouble * 1e6).floor.toLong)
      assert(rate > 0 && rate < 1)
    }
    // alpha=0.5 flattening: head language's share shrinks, tail's grows
    val head = out.maxBy(_._2)
    val tail = out.minBy(_._2)
    assert(head._4 < head._2.toDouble / total)
    assert(tail._4 > tail._2.toDouble / total)
    // expected docs never exceed the total and respect the weight order
    assert(out.map(_._5).sum <= total)
    assert(out.sortBy(_._3).map(_._5).toSeq.sorted === out.sortBy(_._3).map(_._5).toSeq)
  }

  test("q67: quantization codes bound the reconstruction error by one scale step") {
    import spark.implicits._
    val out = SparkEntry.queries("q67_vec_quantize")(spark, dir)
      .as[(Long, Double, Long, Double)].collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.length === emb.size)
    out.foreach { case (id, scaleR, qsum, maxErr) =>
      val v = emb(id)
      val (mn, mx) = (v.min, v.max)
      val scale = (mx - mn) / 255d
      assert(math.abs(scaleR - scale) < 1e-6)
      // codes are within [0, 255] and reconstruct within one step
      // (+5e-7: max_err is reported rounded to 6 dp, scale is raw)
      assert(maxErr <= scale + 5e-7, s"vec $id max_err $maxErr vs scale $scale")
      assert(qsum >= 0 && qsum <= 255L * v.length)
    }
  }
}
