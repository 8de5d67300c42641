package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** Training-data text pipeline operators over the `documents` table:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting, exact dedup, MinHash+LSH near-dup, character-n-gram
  * Jaccard, and SimHash (builder-prompt first-class requirements).
  *
  * Everything except SimHash / rolling-hash has a DuckDB oracle built
  * only from portable primitives (length/replace arithmetic, md5,
  * generate_series) so results hash-match across engines. SimHash and
  * the rolling Rabin fingerprint use xxhash64 bit tricks DuckDB lacks —
  * those ship as rows-only checks plus Scala unit tests.
  */
object TextOps {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** #occurrences of `word` (space-delimited) via replace arithmetic —
    * the one counting primitive both engines implement identically. */
  private def occ(c: Column, word: String): Column =
    ((length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(" " + word + " "), ""))) /
      lit(word.length + 2)).cast("long")

  // NOTE: regexp_replace flavors differ across engines; for oracle
  // parity we use plain `replace` semantics via translate-free exprs.
  private def occPlain(c: Column, pat: String): Column =
    ((length(c) - length(replaceCol(c, pat))) / lit(pat.length)).cast("long")

  private def replaceCol(c: Column, pat: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(pat), "")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace tokens, per-language totals.
    "q20_token_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = s.read.parquet(t(dir, "documents"))
        .withColumn("n_tokens",
          (length($"text") - length(replaceCol($"text", " ")) + 1).cast("long"))
      d.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          min($"n_tokens").as("min_tokens"),
          max($"n_tokens").as("max_tokens"))
        .orderBy($"lang")
    }),

    // quality scoring: length, avg word length, stopword ratio.
    "q21_quality" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .withColumn("n_tokens",
          (length($"text") - length(replaceCol($"text", " ")) + 1).cast("long"))
        .withColumn("n_stop",
          occPlain(concat(lit(" "), $"text", lit(" ")), " the ") +
            occPlain(concat(lit(" "), $"text", lit(" ")), " a "))
        .select($"doc_id", $"n_tokens",
          (length(replaceCol($"text", " ")).cast("double") / $"n_tokens").as("avg_word_len"),
          ($"n_stop".cast("double") / $"n_tokens").as("stopword_ratio"))
        .orderBy($"doc_id")
    }),

    // language-ID heuristic: marker-token votes, deterministic argmax.
    "q22_lang_guess" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val padded = concat(lit(" "), $"text", lit(" "))
      s.read.parquet(t(dir, "documents"))
        .withColumn("en_score", occPlain(padded, " the ") + occPlain(padded, " row "))
        .withColumn("qy_score", occPlain(padded, " query ") + occPlain(padded, " scan "))
        .withColumn("dt_score", occPlain(padded, " data ") + occPlain(padded, " table "))
        .select($"doc_id", $"lang",
          when($"en_score" >= $"qy_score" && $"en_score" >= $"dt_score", "style_en")
            .when($"qy_score" >= $"dt_score", "style_query")
            .otherwise("style_data").as("guess"))
        .orderBy($"doc_id")
    }),

    // exact dedup: md5 content fingerprint, keep min doc_id per group.
    "q23_dedup_exact" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .groupBy(md5($"text").as("fp"))
        .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy($"keep_id")
    }),

    // MinHash + LSH near-dup: 8-char shingles, 4 bands, md5 min-hash,
    // band-bucket self-join → candidate pairs.
    "q24_minhash_lsh" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val sh = s.read.parquet(t(dir, "documents"))
        .select($"doc_id",
          explode(sequence(lit(1), greatest(length($"text") - 7, lit(1)))).as("i"),
          $"text")
        .select($"doc_id", expr("substr(text, i, 8)").as("sh"))
        .distinct()
      val mh = sh
        .crossJoin(s.range(0, 4).select($"id".cast("int").as("band")))
        .groupBy($"doc_id", $"band")
        .agg(min(md5(concat($"band".cast("string"), $"sh"))).as("minh"))
      val a = mh.select($"doc_id".as("doc_a"), $"band", $"minh")
      val b = mh.select($"doc_id".as("doc_b"), $"band", $"minh")
      a.join(b, Seq("band", "minh"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b")
        .distinct()
        .orderBy($"doc_a", $"doc_b")
    }),

    // n-gram Jaccard similarity on a deterministic subsample.
    "q25_ngram_jaccard" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = s.read.parquet(t(dir, "documents"))
        .filter($"doc_id" % 25 === 0)
      val sh = docs
        .select($"doc_id",
          explode(sequence(lit(1), greatest(length($"text") - 2, lit(1)))).as("i"),
          $"text")
        .select($"doc_id", expr("substr(text, i, 3)").as("sh"))
        .distinct()
      val cnt = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("x").join(sh.as("y"), $"x.sh" === $"y.sh" && $"x.doc_id" < $"y.doc_id")
        .groupBy($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"))
        .agg(count(lit(1)).as("i"))
      inter
        .join(cnt.select($"doc_id".as("doc_a"), $"n".as("na")), "doc_a")
        .join(cnt.select($"doc_id".as("doc_b"), $"n".as("nb")), "doc_b")
        .select($"doc_a", $"doc_b",
          ($"i".cast("double") / ($"na" + $"nb" - $"i")).as("jaccard"))
        .filter($"jaccard" >= 0.2)
        .orderBy($"doc_a", $"doc_b")
    }),

    // md5-based document fingerprint (portable half of F2).
    "q26_fingerprint" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id", substring(md5($"text"), 1, 16).as("fp16"),
          length($"text").as("text_len"))
        .orderBy($"doc_id")
    }),

    // SimHash (64-bit, xxhash64 token bits) via the native Catalyst
    // expression (graft.functions.SimHash64Expr) — rows-only check;
    // the algorithm is unit-tested in OperatorsSpec.
    "q27_simhash" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id",
          graft.functions.GraftFunctions.simhash64(split($"text", " ")).as("simhash"))
        .orderBy($"doc_id")
    }),

    // rolling Rabin fingerprint (mod 2^61-1) — rows-only check.
    "q28_rolling_hash" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id", TextOps.rollingHashUdf($"text").as("rabin64"))
        .orderBy($"doc_id")
    }),

    // BPE-ish regex tokenization: letter runs / digit runs / single
    // punctuation, the pre-tokenizer shape BPE vocabularies use.
    "q34_token_bpe" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id",
          size(regexp_extract_all($"text", lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          (length($"text") - length(replaceCol($"text", " ")) + 1).cast("long")
            .as("n_ws_tokens"))
        .orderBy($"doc_id")
    }),

    // charset sniff + decode (F6): payload bytes -> detected charset +
    // decoded length, via the CharsetSniffer heuristic per partition.
    "q35_charset_decode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id", encode($"text", "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val cs = graft.core.CharsetSniffer.sniff(bytes)
            val decoded = graft.core.CharsetSniffer.decode(bytes)
            (id, cs.name(), decoded.length.toLong)
          }
        }
        .toDF("doc_id", "charset", "decoded_len")
        .orderBy($"doc_id")
    }))

  /** 64-bit SimHash over tokens: per-token xxhash64, bitwise vote. */
  def simhash(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { tok =>
      val h = Hashing.xxhash64(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  val simhashUdf = udf { (tokens: Seq[String]) => simhash(tokens) }

  /** Rolling polynomial (Rabin-style) hash, base 257, mod 2^61-1. */
  def rollingHash(s: String): Long = {
    val M = (1L << 61) - 1
    var h = 0L
    var i = 0
    while (i < s.length) {
      // multiply mod M via Math.multiplyHigh-free 128-bit split
      val hi = Math.multiplyHigh(h, 257L)
      val lo = h * 257L
      h = ((lo & M) + ((hi << 3) | (lo >>> 61))) % M
      h = (h + s.charAt(i)) % M
      i += 1
    }
    h
  }

  val rollingHashUdf = udf { (s: String) => rollingHash(s) }

  val oracles: Map[String, String] = Map(
    "q20_token_stats" ->
      """WITH d AS (SELECT lang,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q21_quality" ->
      """WITH d AS (SELECT doc_id, text, ' ' || text || ' ' AS padded,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_tokens AS avg_word_len,
        |  CAST((length(padded) - length(replace(padded, ' the ', ''))) / 5
        |     + (length(padded) - length(replace(padded, ' a ', ''))) / 3 AS DOUBLE)
        |    / n_tokens AS stopword_ratio
        |FROM d ORDER BY doc_id""".stripMargin,
    "q22_lang_guess" ->
      """WITH d AS (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  (length(p) - length(replace(p, ' the ', ''))) / 5
        |    + (length(p) - length(replace(p, ' row ', ''))) / 5 AS en_score,
        |  (length(p) - length(replace(p, ' query ', ''))) / 7
        |    + (length(p) - length(replace(p, ' scan ', ''))) / 6 AS qy_score,
        |  (length(p) - length(replace(p, ' data ', ''))) / 6
        |    + (length(p) - length(replace(p, ' table ', ''))) / 7 AS dt_score
        |  FROM d)
        |SELECT doc_id, lang,
        |  CASE WHEN en_score >= qy_score AND en_score >= dt_score THEN 'style_en'
        |       WHEN qy_score >= dt_score THEN 'style_query'
        |       ELSE 'style_data' END AS guess
        |FROM sc ORDER BY doc_id""".stripMargin,
    "q23_dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q24_minhash_lsh" ->
      """WITH sh0 AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 8) AS sh
        |  FROM sh0),
        |mh AS (
        |  SELECT doc_id, band, MIN(md5(CAST(band AS VARCHAR) || sh)) AS minh
        |  FROM sh CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b
        |  GROUP BY doc_id, band)
        |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM mh a JOIN mh b ON a.band = b.band AND a.minh = b.minh
        |  AND a.doc_id < b.doc_id
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q25_ngram_jaccard" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0),
        |sh0 AS (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, greatest(length(text) - 2, 1))) AS i
        |  FROM d),
        |sh AS (
        |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 3) AS sh
        |  FROM sh0),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS i
        |  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(i AS DOUBLE) / (ca.n + cb.n - i) AS jaccard
        |FROM inter
        |JOIN cnt ca ON ca.doc_id = doc_a
        |JOIN cnt cb ON cb.doc_id = doc_b
        |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q26_fingerprint" ->
      """SELECT doc_id, substr(md5(text), 1, 16) AS fp16,
        |  CAST(length(text) AS INTEGER) AS text_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_token_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |    AS n_bpe_tokens,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |    AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q35_charset_decode" ->
      """SELECT doc_id, 'UTF-8' AS charset,
        |  CAST(length(text) AS BIGINT) AS decoded_len
        |FROM documents ORDER BY doc_id""".stripMargin)
}
