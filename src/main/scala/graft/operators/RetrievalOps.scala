package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval-flavored corpus operators: BM25 relevance scoring and
  * exact-substring (13-gram) cross-document overlap — the two
  * remaining public-knowledge staples of a training-data pipeline
  * (Robertson/Sparck-Jones BM25; Lee et al. "Deduplicating Training
  * Data Makes Language Models Better" exact-substring dedup).
  *
  * Scale shapes:
  *  - q63 is one scan with per-row array lambdas (tf per query term,
  *    doc length) plus ONE corpus-constant aggregate (N, avgdl, df per
  *    term — a handful of scalars, broadcast-scale state exactly like
  *    q44's N); no join, no explode, zero data shuffled beyond the
  *    3-scalar agg. Scoring 100 TB is embarrassingly parallel.
  *  - q64 reuses the LSH bucket-enumeration pattern (one hash agg per
  *    shingle key + bounded within-bucket pair expansion) instead of a
  *    shingle self-join: per distinct shingle the capped doc list is
  *    collected once, pairs are enumerated executor-side, and a
  *    second hash agg counts shared shingles per pair. The 512-doc
  *    bucket cap is the same skew valve the LSH gates carry — a
  *    boilerplate shingle shared by millions of documents at corpus
  *    scale would otherwise go quadratic.
  */
object RetrievalOps {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** Fixed query terms (k1 = 1.2 and b = 0.75 are inlined in both
    * formulations). Terms are drawn from the synthetic corpus
    * vocabulary so document-frequency is non-trivial at every scale. */
  private val QueryTerms = Seq("join", "window", "scan")

  /** q64 shingle width (words) and the bucket-cap skew valve. */
  private val ShingleWords = 13
  private val BucketCap = 512

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // q63: BM25 scores for a fixed 3-term query over the corpus.
    // Ranking keys stay integer-exact (tf, dl); the float score is an
    // output column rounded to 6 dp (the q44 float-parity protocol) and
    // rows are ordered by doc_id, never by the float.
    "q63_bm25" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val tfCols = QueryTerms.map(q =>
        expr(s"cast(size(filter(words, x -> x = '$q')) as bigint)").as(s"tf_$q"))
      // NOT widened: measured 0.66 -> 0.73 s with the widen exchange —
      // the frame feeds both the stats collect and the scored output,
      // so the exchange is paid twice while the per-row work is three
      // array filters (guide §1.2: measure, then decide)
      val m = s.read.parquet(t(dir, "documents"))
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id") +: expr("cast(size(words) as bigint)").as("dl") +: tfCols: _*)
      // Corpus constants: one tiny agg (broadcast-scale state).
      val statRow = m.agg(
        count(lit(1)).cast("double").as("n"),
        (sum($"dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"),
        count(when($"tf_join" > 0, 1)).cast("double").as("df_join"),
        count(when($"tf_window" > 0, 1)).cast("double").as("df_window"),
        count(when($"tf_scan" > 0, 1)).cast("double").as("df_scan")).head()
      val (n, avgdl) = (statRow.getDouble(0), statRow.getDouble(1))
      val dfs = QueryTerms.zipWithIndex.map { case (q, i) => q -> statRow.getDouble(2 + i) }.toMap
      // Written in the oracle's exact textual order: term scores
      // summed left-to-right, each ln(1 + (N - df + .5)/(df + .5)) ·
      // tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)) with b = 0.75.
      val termScore = QueryTerms.map { q =>
        val df = dfs(q)
        log(lit(1d) + (lit(n) - lit(df) + lit(0.5)) / (lit(df) + lit(0.5))) *
          (col(s"tf_$q") * lit(2.2)) /
          (col(s"tf_$q") + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / lit(avgdl)))
      }.reduceLeft(_ + _)
      m.filter($"tf_join" + $"tf_window" + $"tf_scan" > 0)
        .select($"doc_id", $"dl", $"tf_join", $"tf_window", $"tf_scan",
          round(termScore, 6).as("bm25"))
        .orderBy($"doc_id")
    }),

    // q64: exact-substring overlap — document pairs sharing at least
    // one 13-word shingle, with the shared-shingle count. Pairs are
    // bucket-enumerated per shingle (capped collect_set, no self-join).
    // The bucket key is an md5-derived 48-bit integer of the shingle,
    // computed by the SAME formula in the oracle — so the distinct and
    // the group-by shuffle 8-byte longs instead of ~80-char strings
    // (the 10× exchange-volume cut that matters at corpus scale), and
    // any rare key collision is seen identically by both engines
    // (parity by construction; it only merges two buckets' doc lists).
    "q64_substring_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // no distinct() before the agg: cappedSortedSet collects a
      // DISTINCT set (cap on distinct count) inside the buffer, so a
      // separate dedup pass would add a second corpus-token-scale
      // exchange for identical semantics
      val sh = Scans.widen(
          s.read.parquet(t(dir, "documents")).select($"doc_id", $"text"))
        .select($"doc_id", split($"text", " ").as("words"))
        .select($"doc_id",
          explode(expr(
            s"""transform(sequence(1, greatest(size(words) - ${ShingleWords - 1}, 1)),
               |  i -> cast(conv(substring(md5(array_join(slice(words, cast(i as int), $ShingleWords), ' ')), 1, 12), 16, 10) as bigint))""".stripMargin))
            .as("sg"))
      val buckets = sh.groupBy($"sg")
        .agg(TextOps.cappedSortedSet($"doc_id", BucketCap).as("docs"))
        .filter($"docs".isNotNull && size($"docs") >= 2)
      buckets
        .select(explode($"docs").as("doc_a"), $"docs")
        .select($"doc_a", explode($"docs").as("doc_b"))
        .filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy($"doc_a", $"doc_b")
    }),

    // q73: exact-substring REMOVAL — the act-on-it completion of q64's
    // detection (Lee et al.: cut the duplicated passage, keep the
    // rest of the document). Every 13-token window whose hash appears
    // in ≥2 documents keeps its canonical copy (the bucket's min
    // doc_id) and is cut everywhere else; a token survives iff no
    // removed window covers it. Output is (doc_id, n_tokens,
    // n_removed, clean_md5 = md5 of the rebuilt text) for EVERY doc —
    // the gate carries the fingerprint, not the corpus bytes.
    // Scale shape: positional shingles stream through ONE hash agg
    // (distinct doc set per shingle, 512 valve) to build the
    // duplicated-shingle directory; the directory joins back on the
    // compact 48-bit key; removal positions collapse per doc (ids +
    // ints only); the single text-bearing stage is the final
    // doc_id-keyed join, co-partitioned under bucketing at warehouse
    // scale. No stage ever holds more than one document's tokens.
    "q73_substring_scrub" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val docs = Scans.widen(
        s.read.parquet(t(dir, "documents")).select($"doc_id", $"text"))
      scrubCorpus(docs).orderBy($"doc_id")
    }))

  /** Positional 13-token shingles `(doc_id, i, sg)` of a `(doc_id,
    * text)` frame — q64's hash formula with the position kept. Shared
    * by the q73 batch gate and the streaming scrub. */
  private[graft] def posShingles(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", split($"text", " ").as("words"))
      .select($"doc_id",
        explode(expr(
          s"""transform(sequence(1, greatest(size(words) - ${ShingleWords - 1}, 1)),
             |  i -> struct(cast(i as long) as i,
             |    cast(conv(substring(md5(array_join(slice(words, cast(i as int), $ShingleWords), ' ')), 1, 12), 16, 10) as bigint) as sg))""".stripMargin))
          .as("x"))
      .select($"doc_id", $"x.i".as("i"), $"x.sg".as("sg"))
  }

  /** The duplicated-shingle directory `(sg, keeper)`: every 13-token
    * window hash held by ≥2 documents (512 valve), with its canonical
    * keeper = min doc_id. Corpus-bounded, build-once — the persisted
    * form is [[graft.streaming.ScrubStore]]. */
  private[graft] def dupShingleDirectory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cappedSortedSet dedups inside the aggregation buffer — no
    // distinct() pass (same reasoning as q64)
    posShingles(Scans.widen(
        s.read.parquet(t(dir, "documents")).select($"doc_id", $"text")))
      .select($"doc_id", $"sg")
      .groupBy($"sg")
      .agg(TextOps.cappedSortedSet($"doc_id", BucketCap).as("docs"))
      .filter($"docs".isNotNull && size($"docs") >= 2)
      .select($"sg", element_at($"docs", 1).as("keeper"))
  }

  /** Scrub `(doc_id, text)` rows against a duplicated-shingle
    * directory: every non-canonical occurrence of a directory shingle
    * cuts its 13-token window; a token survives iff no removed window
    * covers it. A doc's verdict depends ONLY on its text and the
    * directory, so the result is invariant to batching (the streaming
    * gate's contract). The directory joins on the compact 48-bit key —
    * never broadcast-assumed: at warehouse scale it is corpus-bounded,
    * not benchmark-bounded. */
  /** The q73 batch body: directory AND removal positions from ONE
    * aggregate on ONE positional-shingle pass (round-8 verdict #3
    * fused the two `posShingles` passes behind a localCheckpoint;
    * round 9 goes further — [[graft.functions.CappedDupOccAgg]]
    * computes the keeper and the non-keeper occurrence positions in
    * the SAME `sg`-keyed aggregation, so the checkpoint, the second
    * scan of the shingle frame, and the `ps ⋈ directory` shuffle all
    * disappear; guide §2.4, two operations keyed the same way share
    * one exchange). The 512-doc distinct valve is unchanged — an
    * over-cap shingle collapses to NULL inside the buffer, exactly
    * the [[TextOps.cappedSortedSet]] contract. Pinned equal to the
    * legacy two-pass directory + scrub by RewriteEquivalenceSpec.
    * Same-phase A/B at sf0.1 (interleaved same-JVM reps, 6 each, a
    * dim-ok VM window): checkpoint shape med 3.68 s / best 2.51 s ->
    * fused med 2.15 s / best 1.57 s (~-40%), outputs byte-identical
    * (exceptAll = 0 both ways). */
  private[graft] def scrubCorpus(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val rem = posShingles(docs)
      .groupBy($"sg")
      .agg(cappedDupOccurrences($"doc_id", $"i", BucketCap).as("occ"))
      .filter($"occ".isNotNull)
      .select(explode($"occ").as("o"))
      .select($"o.doc_id".as("doc_id"),
        explode(sequence($"o.p", $"o.p" + lit(ShingleWords - 1).cast("long")))
          .as("p"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_set($"p")).as("rem"))
    rebuildWith(docs, rem)
  }

  private[graft] def cappedDupOccurrences(doc: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column, cap: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.CappedDupOccAgg(
      ColumnShim.expression(doc), ColumnShim.expression(pos), cap)
      .toAggregateExpression())
  }

  private[graft] def scrubAgainst(docs: DataFrame, dups: DataFrame): DataFrame =
    scrubWith(docs, posShingles(docs), dups)

  /** Scrub body over a caller-supplied positional-shingle frame of
    * `docs` — shared by the batch gate (one materialized frame, two
    * consumers) and the streaming per-micro-batch scrub (fresh tiny
    * frame per batch). */
  private def scrubWith(docs: DataFrame, ps: DataFrame,
      dups: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // removal positions: overlapping windows collapse inside the
    // collect_set aggregation buffer (no separate distinct pass — the
    // exploded position stream is the scrub's largest intermediate)
    val rem = ps.join(dups, "sg")
      .filter($"doc_id" =!= $"keeper")
      .select($"doc_id",
        explode(sequence($"i", $"i" + lit(ShingleWords - 1).cast("long")))
          .as("p"))
      .groupBy($"doc_id")
      .agg(sort_array(collect_set($"p")).as("rem"))
    rebuildWith(docs, rem)
  }

  /** Rebuild tail shared by the fused batch gate and the streaming
    * scrub: join the per-doc removal positions back to the text and
    * fingerprint what survives. */
  private def rebuildWith(docs: DataFrame, rem: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val words = docs.select($"doc_id", split($"text", " ").as("words"))
    // rebuild: per-row lambda keeps tokens not covered by a removed
    // window (lambda index is 0-based; positions are 1-based)
    words.join(rem, Seq("doc_id"), "left")
      .withColumn("kept", expr(
        "CASE WHEN rem IS NULL THEN words ELSE " +
          "filter(words, (w, p) -> NOT array_contains(rem, cast(p + 1 as long))) END"))
      .select($"doc_id",
        size($"words").cast("long").as("n_tokens"),
        (size($"words") - size($"kept")).cast("long").as("n_removed"),
        md5(array_join($"kept", " ")).as("clean_md5"))
  }

  def oracles: Map[String, String] = Map(
    "q63_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(words) AS BIGINT) AS dl,
        |  CAST(len(list_filter(words, x -> x = 'join')) AS BIGINT) AS tf_join,
        |  CAST(len(list_filter(words, x -> x = 'window')) AS BIGINT) AS tf_window,
        |  CAST(len(list_filter(words, x -> x = 'scan')) AS BIGINT) AS tf_scan
        |  FROM d),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl,
        |  CAST(count(*) FILTER (tf_join > 0) AS DOUBLE) AS df_join,
        |  CAST(count(*) FILTER (tf_window > 0) AS DOUBLE) AS df_window,
        |  CAST(count(*) FILTER (tf_scan > 0) AS DOUBLE) AS df_scan FROM m)
        |SELECT doc_id, dl, tf_join, tf_window, tf_scan,
        |  round(
        |    ln(1 + (st.n - st.df_join + 0.5) / (st.df_join + 0.5)) * (tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * dl / st.avgdl))
        |  + ln(1 + (st.n - st.df_window + 0.5) / (st.df_window + 0.5)) * (tf_window * 2.2) / (tf_window + 1.2 * (0.25 + 0.75 * dl / st.avgdl))
        |  + ln(1 + (st.n - st.df_scan + 0.5) / (st.df_scan + 0.5)) * (tf_scan * 2.2) / (tf_scan + 1.2 * (0.25 + 0.75 * dl / st.avgdl)), 6) AS bm25
        |FROM m, st WHERE tf_join + tf_window + tf_scan > 0 ORDER BY doc_id""".stripMargin,
    "q64_substring_dedup" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |s AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(array_to_string(list_slice(words, CAST(i AS BIGINT), CAST(i + ${ShingleWords - 1} AS BIGINT)), ' ')), 1, 12))::BIGINT AS sg
         |      FROM (SELECT doc_id, words,
         |        unnest(range(1, greatest(len(words) - ${ShingleWords - 1}, 1) + 1)) AS i FROM w)),
         |b AS (SELECT sg, list(doc_id ORDER BY doc_id) AS docs FROM s
         |      GROUP BY sg HAVING count(*) BETWEEN 2 AND $BucketCap)
         |SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_shared
         |FROM (SELECT unnest(docs) AS doc_a, docs FROM b) t1, unnest(t1.docs) u(doc_b)
         |WHERE doc_a < doc_b GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "q73_substring_scrub" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         |p AS (SELECT doc_id, i,
         |    ('0x' || substr(md5(array_to_string(list_slice(words, CAST(i AS BIGINT), CAST(i + ${ShingleWords - 1} AS BIGINT)), ' ')), 1, 12))::BIGINT AS sg
         |  FROM (SELECT doc_id, words, unnest(range(1, greatest(len(words) - ${ShingleWords - 1}, 1) + 1)) AS i FROM w)),
         |d AS (SELECT sg, min(doc_id) AS keeper
         |  FROM (SELECT DISTINCT doc_id, sg FROM p)
         |  GROUP BY sg HAVING count(*) BETWEEN 2 AND $BucketCap),
         |r AS (SELECT DISTINCT p.doc_id, CAST(u.pp AS BIGINT) AS pp
         |  FROM p JOIN d USING (sg), unnest(range(p.i, p.i + $ShingleWords)) u(pp)
         |  WHERE p.doc_id <> d.keeper),
         |tok AS (SELECT doc_id, CAST(k AS BIGINT) AS k, words[CAST(k AS BIGINT)] AS wd
         |  FROM w, unnest(range(1, len(words) + 1)) t(k)),
         |kept AS (SELECT t.doc_id, list(t.wd ORDER BY t.k) AS kw
         |  FROM tok t LEFT JOIN r ON r.doc_id = t.doc_id AND r.pp = t.k
         |  WHERE r.pp IS NULL GROUP BY t.doc_id)
         |SELECT w.doc_id, CAST(len(w.words) AS BIGINT) AS n_tokens,
         |  CAST(len(w.words) - coalesce(len(kept.kw), 0) AS BIGINT) AS n_removed,
         |  md5(coalesce(array_to_string(kept.kw, ' '), '')) AS clean_md5
         |FROM w LEFT JOIN kept USING (doc_id)
         |ORDER BY doc_id""".stripMargin)
}
