package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface over the driver testdata corpus
  * (SURVEY.md §2.2–§2.6): scans with pushdown, joins (broadcast /
  * shuffled / semi / anti), aggregations, windows, set ops, rollups,
  * top-k. Each query has a DuckDB oracle with identical column names
  * and values.
  *
  * FP determinism: money columns are exact 2-decimal doubles (verified
  * against the corpus), so `cast(x as decimal(18,2))` is unambiguous in
  * both engines; sums run exactly in decimal and only the final value
  * is cast back to double — hash-equal across engines regardless of
  * accumulation order.
  */
object RelationalQueries {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"
  private def d2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // widen the projected scan (guide §2.5): the decimal casts + sums
      // otherwise run in the one-row-group scan's single task
      Scans.widen(s.read.parquet(t(dir, "lineitem"))
          .select($"l_returnflag", $"l_linestatus", $"l_quantity",
            $"l_extendedprice", $"l_discount"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(d2($"l_quantity")).cast("double").as("sum_qty"),
          sum(d2($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(d2($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - d2($"l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q2_filter_project" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "lineitem"))
        .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-06-01").cast("timestamp") &&
          $"l_discount" >= 0.05 && $"l_quantity" < 25)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice", $"l_shipdate")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q3_join_agg" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
      val l = s.read.parquet(t(dir, "lineitem"))
      // the customer dimension (filtered to one segment) is broadcast
      // explicitly (guide §3.1 — the session disables auto-broadcast,
      // so hints are the deliberate-strategy channel); the l join o
      // fact-fact join stays a shuffle join, the correct 100 TB shape
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c.filter($"c_mktsegment" === "BUILDING")),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_custkey", $"c_name")
        .agg(sum(d2($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - d2($"l_discount")))
          .cast("double").as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }),

    "q4_broadcast_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val sup = s.read.parquet(t(dir, "supplier"))
      val nat = s.read.parquet(t(dir, "nation"))
      val reg = s.read.parquet(t(dir, "region"))
      sup.join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(d2($"s_acctbal")).cast("double").as("total_acctbal"))
        .orderBy($"r_name")
    }),

    "q5_window_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      s.read.parquet(t(dir, "orders"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_custkey", $"rn")
    }),

    "q6_anti_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders"))
        .filter($"o_orderstatus" === "F")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    "q7_semi_having" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = s.read.parquet(t(dir, "orders"))
      val l = s.read.parquet(t(dir, "lineitem"))
      val big = l.groupBy($"l_orderkey").agg(count(lit(1)).as("n_items"))
        .filter($"n_items" >= 5)
      o.join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderstatus")
    }),

    "q8_string_fns" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "part"))
        .select(
          $"p_partkey",
          lower($"p_brand").as("brand_lc"),
          substring($"p_type", 1, 5).as("type_prefix"),
          length($"p_name").as("name_len"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"))
        .filter($"p_size" >= 30)
        .orderBy($"p_partkey")
    }),

    "q9_json" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Scans.widen(s.read.parquet(t(dir, "events"))
          .select($"event_id", $"event_type", $"props"))
        .select($"event_id", $"event_type",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sum_k"),
          min($"k").as("min_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    "q10_datetime" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "events"))
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n_events"),
          sum(d2($"value")).cast("double").as("sum_value"))
        .orderBy($"day")
    }),

    "q11_rollup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "orders"))
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(d2($"o_totalprice")).cast("double").as("total"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"total")
        .orderBy($"status", $"priority")
    }),

    "q12_topk_global" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "lineitem"))
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(25)
    }),

    "q13_distinct" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "lineitem"))
        .select($"l_returnflag", $"l_linestatus")
        .distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q14_set_union" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = s.read.parquet(t(dir, "customer"))
        .select($"c_nationkey".as("nationkey"))
      val sup = s.read.parquet(t(dir, "supplier"))
        .select($"s_nationkey".as("nationkey"))
      c.union(sup).distinct()
        .orderBy($"nationkey")
    }),

    // A3: approx_count_distinct telemetry — the oracle asserts the
    // accuracy contract (HLL++ within 5% of exact) rather than the
    // sketch value, which is engine-specific.
    "q37_approx_distinct" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      s.read.parquet(t(dir, "lineitem"))
        .agg(
          countDistinct($"l_partkey").as("n_exact"),
          (abs(approx_count_distinct($"l_partkey") - countDistinct($"l_partkey"))
            .cast("double") / countDistinct($"l_partkey") <= 0.05).as("approx_within_5pct"))
    }),

    // SO3: intersect — nations present among both customers+suppliers.
    "q38_intersect" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val c = s.read.parquet(t(dir, "customer")).select($"c_nationkey".as("nationkey"))
      val sup = s.read.parquet(t(dir, "supplier")).select($"s_nationkey".as("nationkey"))
      c.intersect(sup).orderBy($"nationkey")
    }),

    // P1: per-task option merge — defaults coalesced over a left join
    // (node-crawler merges task options over crawler globals).
    "q39_option_merge" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val o = s.read.parquet(t(dir, "orders"))
      val big = o.filter($"o_totalprice" > 400000)
        .select($"o_custkey".as("k"), $"o_orderpriority".as("vip_priority"))
        .groupBy($"k").agg(min($"vip_priority").as("vip_priority"))
      s.read.parquet(t(dir, "customer"))
        .join(big, $"c_custkey" === $"k", "left")
        .select($"c_custkey",
          coalesce($"vip_priority", lit("3-DEFAULT")).as("effective_priority"))
        .orderBy($"c_custkey")
    }),

    "q15_grouping_sets" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // GROUPING SETS via cube, filtered to the two sets of interest —
      // (status) and (priority) marginals (SURVEY.md §2.4 A4).
      s.read.parquet(t(dir, "orders"))
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .filter(($"o_orderstatus".isNull && $"o_orderpriority".isNotNull) ||
          ($"o_orderstatus".isNotNull && $"o_orderpriority".isNull))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"), $"n")
        .orderBy($"status", $"priority")
    }))

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1997-06-01'
        |  AND l_discount >= 0.05 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT r_name, COUNT(*) AS n_suppliers,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q5_window_topk" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q7_semi_having" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey GROUP BY l_orderkey HAVING COUNT(*) >= 5)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q8_string_fns" ->
      """SELECT p_partkey, lower(p_brand) AS brand_lc,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part WHERE p_size >= 30 ORDER BY p_partkey""".stripMargin,
    "q9_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q10_datetime" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q11_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q12_topk_global" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin,
    "q13_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q14_set_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier) t
        |ORDER BY nationkey""".stripMargin,
    "q37_approx_distinct" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_exact,
        |  TRUE AS approx_within_5pct
        |FROM lineitem""".stripMargin,
    "q38_intersect" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT SELECT s_nationkey FROM supplier) t
        |ORDER BY nationkey""".stripMargin,
    "q39_option_merge" ->
      """WITH big AS (
        |  SELECT o_custkey AS k, MIN(o_orderpriority) AS vip_priority
        |  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
        |SELECT c_custkey,
        |  COALESCE(vip_priority, '3-DEFAULT') AS effective_priority
        |FROM customer LEFT JOIN big ON c_custkey = k
        |ORDER BY c_custkey""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority, COUNT(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin)
}
