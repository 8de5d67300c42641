package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Hashing

/** Similarity search over the `embeddings` table (builder-prompt
  * first-class requirement): brute-force cosine top-k as the exact
  * baseline, a random-hyperplane LSH-bucketed ANN as the scale path,
  * and embedding-cosine near-duplicate pairs.
  *
  * Dot products fold left-to-right over the array in both engines
  * (Spark `aggregate` and DuckDB `list_dot_product` are sequential), on
  * identical float→double-cast inputs, so cosine values hash-match.
  *
  * Scale notes: brute force is one broadcast of the query vector and a
  * single codegen'd projection — linear scan, no shuffle; at 10^10 rows
  * the LSH variant prunes candidates by signature bucket (equi-join on
  * the 16-bit signature = shuffle on a compact key) before the exact
  * re-rank, trading recall for a ~2^16 fan-in reduction.
  */
object VectorOps {

  private def t(sfDir: String, name: String) = s"$sfDir/$name.parquet"

  /** dot(a, b) with a left-to-right fold, inputs cast to double. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine top-k against the vec_id=0 query vector.
    "q29_cosine_topk" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = s.read.parquet(t(dir, "embeddings"))
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      emb.crossJoin(broadcast(q))
        .select($"vec_id", $"label", cosine($"embedding", $"qv").as("cos"))
        .orderBy($"cos".desc, $"vec_id")
        .limit(50)
    }),

    // embedding-cosine near-duplicate pairs on a deterministic subset.
    "q30_embed_neardup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = s.read.parquet(t(dir, "embeddings"))
        .filter($"vec_id" % 10 === 0)
      val a = emb.select($"vec_id".as("vec_a"), $"embedding".as("ea"))
      val b = emb.select($"vec_id".as("vec_b"), $"embedding".as("eb"))
      a.crossJoin(b)
        .filter($"vec_a" < $"vec_b")
        .select($"vec_a", $"vec_b", cosine($"ea", $"eb").as("cos"))
        .filter($"cos" >= 0.25)
        .orderBy($"vec_a", $"vec_b")
    }),

    // ANN: 16-plane random-hyperplane LSH split into 4 bands of 4 bits
    // (OR-amplification — candidate if ANY band matches), then exact
    // cosine re-rank of the candidate set. Rows-only check (the plane
    // construction needs xxhash bits DuckDB lacks); recall@10 vs brute
    // force is asserted in VectorOpsSpec. At scale the band join is a
    // shuffle on a compact (band, chunk) key instead of an O(n²) scan.
    "q31_ann_lsh" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = s.read.parquet(t(dir, "embeddings"))
      val sig = emb.withColumn("sig", signatureUdf($"embedding"))
      val bandCols = array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright($"sig", b * 4).bitwiseAND(lit(15)).as("chunk"))): _*)
      val bands = sig.select($"vec_id", $"embedding", explode(bandCols).as("bc"))
        .select($"vec_id", $"embedding", $"bc.band", $"bc.chunk")
      val qb = bands.filter($"vec_id" === 0)
        .select($"band", $"chunk", $"embedding".as("qv"))
      bands.join(broadcast(qb), Seq("band", "chunk"))
        .select($"vec_id", $"embedding", $"qv").distinct()
        .select($"vec_id", cosine($"embedding", $"qv").as("cos"))
        .orderBy($"cos".desc, $"vec_id")
        .limit(10)
    }),

    // ANN, IVF variant: coarse quantizer = the first 8 vectors as
    // centroids (deterministic "training"); every vector is assigned
    // to its nearest centroid (one broadcast pass — at scale this is
    // the partitioning key, so a probe touches 2/8 of the data);
    // query probes its 2 nearest cells and re-ranks exactly.
    "q36_ann_ivf" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val emb = s.read.parquet(t(dir, "embeddings"))
      val cents = emb.filter($"vec_id" < 8)
        .select($"vec_id".as("cid"), $"embedding".as("ce"))
      val dist = dot($"embedding", $"embedding") -
        lit(2.0) * dot($"embedding", $"ce") + dot($"ce", $"ce")
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d", $"cid")
      val assigned = emb.crossJoin(broadcast(cents))
        .select($"vec_id", $"embedding", $"cid", dist.as("d"))
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1)
        .select($"vec_id", $"embedding", $"cid")
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      val probeCells = cents.crossJoin(broadcast(q))
        .select($"cid", (dot($"qv", $"qv") - lit(2.0) * dot($"qv", $"ce") +
          dot($"ce", $"ce")).as("d"))
        .orderBy($"d", $"cid").limit(2).select($"cid")
      assigned.join(broadcast(probeCells), "cid")
        .crossJoin(broadcast(q))
        .select($"vec_id", cosine($"embedding", $"qv").as("cos"))
        .orderBy($"cos".desc, $"vec_id")
        .limit(10)
    }))

  /** 16-bit random-hyperplane signature; plane components are ±1 drawn
    * deterministically from SplitMix64(plane, dim) — no trained state,
    * so any executor computes the same planes. */
  def signature(v: Seq[Float]): Int = {
    var sig = 0
    var p = 0
    while (p < 16) {
      var acc = 0.0
      var d = 0
      while (d < v.length) {
        val r = Hashing.draw(0xA11CE + p.toLong * 1315423911L, d)
        val w = if ((r & 1L) == 0L) 1.0 else -1.0
        acc += w * v(d)
        d += 1
      }
      if (acc > 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  val signatureUdf = udf { (v: Seq[Float]) => signature(v) }

  val oracles: Map[String, String] = Map(
    "q29_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))) AS cos
        |FROM embeddings CROSS JOIN q
        |ORDER BY cos DESC, vec_id LIMIT 50""".stripMargin,
    "q30_embed_neardup" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) AS cos
        |FROM e a CROSS JOIN e b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
        |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |     * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))) >= 0.25
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q36_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c.cid,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        list_dot_product(e.v, e.v) - 2*list_dot_product(e.v, c.cv)
        |          + list_dot_product(c.cv, c.cv), c.cid) AS rn
        |    FROM e CROSS JOIN c) t WHERE rn = 1),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        |probe AS (
        |  SELECT cid FROM c CROSS JOIN q
        |  ORDER BY list_dot_product(qv, qv) - 2*list_dot_product(qv, cv)
        |    + list_dot_product(cv, cv), cid
        |  LIMIT 2)
        |SELECT vec_id,
        |  list_dot_product(v, qv)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) AS cos
        |FROM assigned JOIN probe USING (cid) CROSS JOIN q
        |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)
}
