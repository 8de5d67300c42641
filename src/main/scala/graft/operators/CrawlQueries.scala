package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.UrlCanonicalizer

/** Crawl-domain operators expressed over the neutral testdata corpus so
  * the driver's DuckDB oracle can check them (SURVEY.md §5.2 item 5):
  * URL canonicalization (P3), the per-host priority dequeue (W1) as a
  * window query, seen-set anti-join (J1), and gap sessionization over
  * the events stream (window/analytic coverage, §2.5).
  */
object CrawlQueries {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** The engine's canonicalizer as a native Catalyst expression (no
    * per-row Row encode/decode, unlike a Scala UDF); the UDF form is
    * kept for comparison/tests. */
  val canonUdf = udf { (raw: String) =>
    UrlCanonicalizer.canonicalize(raw).orNull
  }
  import graft.functions.GraftFunctions.url_canonicalize

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P3: canonicalization over synthetic messy URLs built from doc_id.
    "q16_url_canon" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "documents"))
        .select($"doc_id",
          concat(lit("HTTP://Host"), $"doc_id" % 20,
            lit(".Example:80/a/../p/"), $"doc_id", lit("?b=2&a=1#frag")).as("url_raw"))
        .select($"doc_id", url_canonicalize($"url_raw").as("url_canon"))
        .orderBy($"doc_id")
    }),

    // W1: per-host priority dequeue as row_number window + quota.
    "q17_host_dequeue" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val f = s.read.parquet(t(dir, "documents"))
        .select($"doc_id",
          concat(lit("h"), $"doc_id" % 13).as("host"),
          ($"doc_id" % 10).as("priority"))
      val w = Window.partitionBy($"host").orderBy($"priority", $"doc_id")
      f.withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"host", $"doc_id", $"priority", $"rn")
        .orderBy($"host", $"rn")
    }),

    // J1: seen-set left_anti equi-join.
    "q18_seen_antijoin" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val cand = s.read.parquet(t(dir, "documents")).select($"doc_id")
      val seen = s.read.parquet(t(dir, "events")).select($"user_id")
      cand.join(seen, cand("doc_id") === seen("user_id"), "left_anti")
        .orderBy($"doc_id")
    }),

    // gap sessionization: session breaks at >1h inactivity per user.
    "q19_sessionize" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      // gap arithmetic in exact MICROSECONDS: second-truncating
      // (unix_timestamp) vs second-rounding (epoch cast) semantics
      // disagree for sub-second gaps right at the boundary — micros are
      // exact in both engines at every scale
      val withGap = s.read.parquet(t(dir, "events"))
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_micros($"ts".cast("timestamp")) -
              unix_micros($"prev_ts".cast("timestamp")) > 3600L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum($"new_session").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      withGap.groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").as("session_start"),
          max($"ts").as("session_end"))
        .orderBy($"user_id", $"session_id")
    }),

    // q68: ordered funnel progression per user (view → click →
    // purchase, each step within 24 h of the previous — the window
    // that separates converting users on this corpus) — the
    // conversion analysis every event pipeline runs. ONE shuffle on
    // user_id: the step qualifications are running-min windows over
    // the same (user, ts, event_id) sort (Spark reuses the one
    // exchange+sort for all three window passes), then one hash
    // aggregate per user. A click counts only within 24 h after the
    // user's FIRST view, a purchase only within 24 h after the first
    // QUALIFIED click; ties break on event_id, so the frame is
    // deterministic in both engines, and interval arithmetic is exact
    // microseconds.
    "q68_funnel" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val day = expr("INTERVAL 24 HOURS")
      val x = s.read.parquet(t(dir, "events"))
        .withColumn("t_view_run",
          min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("qc",
          when($"event_type" === "click" && $"ts" > $"t_view_run" &&
            $"ts" <= $"t_view_run" + day, $"ts"))
        .withColumn("t_click_run", min($"qc").over(w))
        .withColumn("qp",
          when($"event_type" === "purchase" && $"ts" > $"t_click_run" &&
            $"ts" <= $"t_click_run" + day, $"ts"))
      x.groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", $"ts")).as("t_view"),
          min($"qc").as("t_click"),
          min($"qp").as("t_purchase"))
        .withColumn("step_reached",
          when($"t_purchase".isNotNull, 3L)
            .when($"t_click".isNotNull, 2L)
            .when($"t_view".isNotNull, 1L).otherwise(0L))
        .orderBy($"user_id")
    }))

  val oracles: Map[String, String] = Map(
    "q16_url_canon" ->
      """SELECT doc_id,
        |  'http://host' || CAST(doc_id % 20 AS VARCHAR) || '.example/p/' ||
        |  CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS url_canon
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q17_host_dequeue" ->
      """SELECT host, doc_id, priority, rn FROM (
        |  SELECT 'h' || CAST(doc_id % 13 AS VARCHAR) AS host, doc_id,
        |    doc_id % 10 AS priority,
        |    row_number() OVER (PARTITION BY 'h' || CAST(doc_id % 13 AS VARCHAR)
        |      ORDER BY doc_id % 10, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 3 ORDER BY host, rn""".stripMargin,
    "q18_seen_antijoin" ->
      """SELECT doc_id FROM documents
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q19_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q68_funnel" ->
      """WITH x1 AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS UNBOUNDED PRECEDING) AS t_view_run
        |  FROM events),
        |x2 AS (SELECT *,
        |  CASE WHEN event_type = 'click' AND ts > t_view_run
        |    AND ts <= t_view_run + INTERVAL 24 HOUR THEN ts END AS qc
        |  FROM x1),
        |x3 AS (SELECT *,
        |  min(qc) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS t_click_run
        |  FROM x2),
        |x4 AS (SELECT *,
        |  CASE WHEN event_type = 'purchase' AND ts > t_click_run
        |    AND ts <= t_click_run + INTERVAL 24 HOUR THEN ts END AS qp
        |  FROM x3)
        |SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |  min(qc) AS t_click,
        |  min(qp) AS t_purchase,
        |  CAST(CASE WHEN min(qp) IS NOT NULL THEN 3
        |       WHEN min(qc) IS NOT NULL THEN 2
        |       WHEN min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL THEN 1
        |       ELSE 0 END AS BIGINT) AS step_reached
        |FROM x4 GROUP BY user_id ORDER BY user_id""".stripMargin)
}
