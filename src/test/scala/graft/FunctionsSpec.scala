package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.UrlCanonicalizer
import graft.functions.{BloomAggregator, GraftFunctions}
import graft.engine.Bloom

/** Native expressions + typed aggregator (SURVEY.md §2.8). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("md5_ints4 is bit-equal to the conv(substring(md5)) hex formula") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.ColumnShim
    val vals = Seq("", "a", "shingle8", "héllo — 日本語 👍",
      "the same boilerplate", "0123456789abcdef" * 5) ++
      (0 until 200).map(i => s"fuzz-$i-${"x" * (i % 17)}")
    val ints4 = ColumnShim.column(
      graft.functions.Md5Ints4Expr(ColumnShim.expression($"s")))
    val rows = vals.toDF("s")
      .withColumn("m", md5($"s"))
      .select(
        array((0 until 4).map(j =>
          conv(substring($"m", j * 8 + 1, 8), 16, 10).cast("long")): _*).as("hex"),
        ints4.as("native"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (hex, native) => assert(hex === native) }
    assert(rows.length === vals.length)
  }

  test("url_canonicalize expression matches the pure function; null-safe") {
    import spark.implicits._
    val raws = Seq(
      "HTTP://Example.COM:80/A/b#frag",
      "http://h/p?b=2&a=1",
      "not a url",
      null)
    val out = raws.toDF("raw")
      .select(GraftFunctions.url_canonicalize($"raw").as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) === UrlCanonicalizer.canonicalize(raws(0)))
    assert(out(1) === Some("http://h/p?a=1&b=2"))
    assert(out(2) === None)
    assert(out(3) === None)
  }

  test("url_canonicalize registered for SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT url_canonicalize('HTTP://H.Example:80/x/../y#f') AS c").head()
    assert(r.getString(0) === "http://h.example/y")
    val h = spark.sql("SELECT simhash64(array('a','b','c')) AS h").head()
    assert(h.getLong(0) === graft.operators.TextOps.simhash(Seq("a", "b", "c")))
    // minhash_sig in SQL: struct field access, values match the API form
    val sig = spark.sql(
      "SELECT minhash_sig('the quick brown fox jumps over me').mh_0 AS m").head()
    import spark.implicits._
    val viaApi = graft.operators.TextOps.signaturesOf(
      Seq((1L, "the quick brown fox jumps over me")).toDF("doc_id", "text"))
      .select($"mh_0").head().getLong(0)
    assert(sig.getLong(0) === viaApi)
  }

  test("simhash64 expression equals the Scala implementation") {
    import spark.implicits._
    val texts = Seq("alpha beta gamma delta", "one two three four five six")
    val out = texts.toDF("t")
      .select(GraftFunctions.simhash64(split($"t", " ")).as("h"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === texts.map(t => graft.operators.TextOps.simhash(t.split(" ").toSeq)))
  }

  test("SpanCodec: pack/unpack round-trips spans exactly (incl. unicode)") {
    import graft.core.Span
    import graft.functions.SpanCodec
    val spans = Seq(
      Span("text", "hello wörld — ünïcode €", null, 0),
      Span("media", null, "media://h/asset/42", 1),
      Span("text", "", null, 2))
    val bytes = SpanCodec.pack(spans)
    val arr = SpanCodec.unpackRows(bytes)
    assert(arr.numElements() === 3)
    (0 until 3).foreach { i =>
      val r = arr.getStruct(i, 4)
      assert(r.getUTF8String(0).toString === spans(i).kind)
      assert(Option(r.getUTF8String(1)).map(_.toString).orNull === spans(i).text)
      assert(Option(r.getUTF8String(2)).map(_.toString).orNull === spans(i).media_ref)
      assert(r.getInt(3) === i)
    }
    assert(SpanCodec.pack(Nil).length === 0)
    assert(SpanCodec.unpackRows(Array.emptyByteArray).numElements() === 0)
  }

  test("minhash_sig native expression is bit-equal to the relational " +
    "formulation (shingle explode + md5 + 33-way aggregate), incl. edges") {
    import spark.implicits._
    import graft.operators.TextOps
    // real corpus texts + adversarial edges: shorter than one shingle,
    // exactly one shingle, non-ASCII (UTF-8 multi-byte windows),
    // repeated content (min saturation)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().take(60)
    val edges = Seq(
      (100001L, "tiny"), (100002L, "exactly8"), (100003L, "nine char"),
      (100004L, "héllo wörld über ångström œuvre déjà-vu " * 3),
      (100005L, "samesame" * 40), (100006L, "a"),
      (100007L, "日本語のテキストです、マルチバイト文字。" * 2),
      // supplementary plane: code-point vs UTF-16 indexing must agree
      (100008L, "emoji 😀 and more 🎉 text with 𝕌𝕟𝕚𝕔𝕠𝕕𝕖 beyond the BMP here"))
    val docs = (corpus.toSeq ++ edges).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getAs[Long]("doc_id"),
          r.getAs[scala.collection.Seq[Long]]("ss").toSeq,
          (0 until 32).map(i => r.getAs[Long](s"mh_$i")))
      }.sortBy(_._1).toSeq
    val native = canon(TextOps.signaturesOf(docs))
    val sql = canon(TextOps.signaturesOfSql(docs))
    assert(native.length === sql.length)
    native.zip(sql).foreach { case (n, s) =>
      assert(n._1 === s._1)
      assert(n._2 === s._2, s"ss mismatch for doc ${n._1}")
      assert(n._3 === s._3, s"minhash mismatch for doc ${n._1}")
    }
    // and the plan really is shuffle-free: scan → project, no exchange
    val plan = TextOps.signaturesOf(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"native signature plan shuffles:\n$plan")
  }

  test("BloomAggregator: partial-merge build, no false negatives") {
    import spark.implicits._
    val keys = (0L until 2000L).map(graft.core.Hashing.splitmix64)
    val bits = Bloom.sizeFor(2000)
    val agg = new BloomAggregator(bits)
    val blob = keys.toDS().repartition(8)
      .select(udaf(agg).apply($"value").as("bloom"))
      .head().getAs[Array[Byte]](0)
    keys.foreach(k => assert(Bloom.mightContain(blob, k)))
    val fp = (100000L until 110000L).map(graft.core.Hashing.splitmix64)
      .count(Bloom.mightContain(blob, _))
    assert(fp < 500)
  }
}
