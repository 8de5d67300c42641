package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.UrlCanonicalizer
import graft.operators.TextOps

/** Native Catalyst expressions for the crawl/text domain
  * (SURVEY.md §2.8): unlike Scala UDFs these operate on Catalyst's
  * internal representation directly (UTF8String in, UTF8String out —
  * no Row encode/decode per call) and stay null-safe inside codegen'd
  * stages. The bodies are non-trivial string algorithms, so they use
  * CodegenFallback: the surrounding stage still whole-stage-codegens,
  * and only the call itself is interpreted — the same trade Spark's own
  * `ParseUrl` makes.
  */

/** `url_canonicalize(str)`: the engine's URL canonicalization as an
  * expression. NULL for unparsable/non-http input. */
case class UrlCanonicalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    UrlCanonicalizer.canonicalize(s)
      .map(UTF8String.fromString).orNull
  }
  override protected def withNewChildInternal(c: Expression): UrlCanonicalizeExpr = copy(c)
  override def prettyName: String = "url_canonicalize"
}

/** `simhash64(array<string>)`: 64-bit SimHash over a token array
  * (xxhash64 per-token bit votes). */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val tokens = (0 until arr.numElements()).map { i =>
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString
    }
    TextOps.simhash(tokens)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(c)
  override def prettyName: String = "simhash64"
}

/** `host_quota(host)`: per-host politeness quota for one BSP round —
  * a pure function of the host name (policy is deterministic), so the
  * engine computes it IN PLACE on candidate rows instead of building a
  * distinct-host dimension and broadcasting a join every round. At
  * 100M+ distinct hosts the dimension/broadcast would be a per-round
  * job + memory wall; this is just a projected column. */
case class HostQuotaExpr(child: Expression, web: graft.core.SyntheticWeb,
    cfg: graft.core.CrawlConfig, round: Long = 0L)
    extends UnaryExpression with CodegenFallback {
  // round-aware: a rateLimitSchedule (mid-crawl setLimiterProperty) can
  // change a limiter's delay for specific rounds. `round` is a
  // constructor constant, so the effective override map (base ++
  // schedule(round)) is computed ONCE per expression instance — never
  // per candidate row (the schedule function + map merge on the
  // dequeue hot path would be millions of allocations per round).
  @transient private lazy val effOverrides: Map[String, Long] =
    cfg.overridesAt(round)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(h: Any): Any = {
    val key = h.asInstanceOf[UTF8String].toString
    cfg.capConnections(key,
      cfg.quotaOfDelay(effOverrides.getOrElse(key, web.policy(key).crawl_delay_ms)))
  }
  override protected def withNewChildInternal(c: Expression): HostQuotaExpr =
    copy(child = c)
  override def prettyName: String = "host_quota"
}

/** `md5_ints4(string)`: the four 32-bit unsigned ints of a value's md5
  * digest, as array<long> — bit-identical to
  * `conv(substring(md5(x), 8j+1, 8), 16, 10)` for j = 0..3 (each int
  * is four digest bytes big-endian), but computed straight from the
  * digest: no 32-char hex formatting and no four radix parses per row.
  * This is the shingle-hash hot path of the MinHash family (millions
  * of shingles per corpus scan); the DuckDB oracles keep the hex
  * formula — values are equal by construction, which the parity test
  * asserts. */
case class Md5Ints4Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any): Any = {
    val d = Md5Ints4Expr.digests.get()
    d.reset()
    val out = d.digest(s.asInstanceOf[UTF8String].getBytes)
    val arr = new Array[Long](4)
    var j = 0
    while (j < 4) {
      arr(j) = ((out(4 * j) & 0xFFL) << 24) | ((out(4 * j + 1) & 0xFFL) << 16) |
        ((out(4 * j + 2) & 0xFFL) << 8) | (out(4 * j + 3) & 0xFFL)
      j += 1
    }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): Md5Ints4Expr =
    copy(child = c)
  override def prettyName: String = "md5_ints4"
}

object Md5Ints4Expr {
  // one digest instance per task thread (MessageDigest is stateful)
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** `minhash_sig(text)`: the per-document MinHash signature — 32
  * universal-hash minhashes over stride-4 8-char shingles plus the
  * distinct 32-bit shingle-hash set — as ONE native expression.
  *
  * A document's signature is a pure function of its own text, so the
  * classic shingle-explode → md5 → 33-way hash-aggregate formulation
  * (millions of intermediate rows and a SHUFFLE per corpus scan) is
  * structural overhead: this expression computes the identical values
  * in a single pass per row — scan → project, embarrassingly parallel,
  * zero exchanges at any corpus size. Bit-parity with the SQL
  * formulation (the DuckDB oracles keep it) is by construction: the
  * same character windows (substr semantics, UTF-8 encoded per
  * window), the same md5-digest→4×int32 split as [[Md5Ints4Expr]],
  * the same (a·h + b) mod 2³¹−1 transforms — asserted end-to-end by
  * FunctionsSpec (incl. non-ASCII) and the store-vs-fresh-gate test.
  *
  * Output: struct(ss: array<long> ASC-sorted distinct h0 values,
  * mh_0..mh_31: long) — the [[graft.operators.TextOps.signaturesOf]]
  * row shape. Sorting `ss` makes persisted signature artifacts fully
  * deterministic (collect_set order was not). */
case class MinhashSigExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import MinhashSigExpr._
  override def dataType: DataType = schema
  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    // SQL length()/substr() count CODE POINTS, not UTF-16 units — for
    // supplementary characters the two diverge, so index by code point
    // (identity mapping on the BMP-only fast path)
    val utf16Len = text.length
    val bmpOnly = text.codePointCount(0, utf16Len) == utf16Len
    val cpOffsets: Array[Int] =
      if (bmpOnly) null
      else {
        val cnt = text.codePointCount(0, utf16Len)
        val o = new Array[Int](cnt + 1)
        var u = 0; var c = 0
        while (u < utf16Len) { o(c) = u; u = text.offsetByCodePoints(u, 1); c += 1 }
        o(cnt) = utf16Len
        o
      }
    val n = if (bmpOnly) utf16Len else cpOffsets.length - 1
    def u16(cp: Int): Int = if (bmpOnly) cp else cpOffsets(cp)
    val digest = digests.get()
    val mins = new Array[Long](32)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val ssSet = new java.util.HashSet[Long]()
    val lastStart = math.max(n - 7, 1) // 1-based, inclusive (substr semantics)
    var i = 1
    while (i <= lastStart) {
      // substr(text, i, 8): code-point window, UTF-8 encoded per window
      val end = math.min(i - 1 + 8, n)
      val window = text.substring(u16(i - 1), u16(end))
      digest.reset()
      val d = digest.digest(window.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var j = 0
      while (j < 4) {
        val h = ((d(4 * j) & 0xFFL) << 24) | ((d(4 * j + 1) & 0xFFL) << 16) |
          ((d(4 * j + 2) & 0xFFL) << 8) | (d(4 * j + 3) & 0xFFL)
        if (j == 0) ssSet.add(h)
        var k = j
        while (k < 32) { // functions k with k % 4 == j consume h_j
          val m = (h * A(k) + B(k)) % graft.operators.TextOps.MinhashP
          if (m < mins(k)) mins(k) = m
          k += 4
        }
        j += 1
      }
      i += 4
    }
    val ss = new Array[Long](ssSet.size())
    val it = ssSet.iterator()
    var z = 0
    while (it.hasNext) { ss(z) = it.next(); z += 1 }
    java.util.Arrays.sort(ss)
    val out = new Array[Any](33)
    out(0) = new GenericArrayData(ss)
    var k = 0
    while (k < 32) { out(k + 1) = mins(k); k += 1 }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(out))
  }
  override protected def withNewChildInternal(c: Expression): MinhashSigExpr =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinhashSigExpr {
  import graft.operators.TextOps.minhashParams
  private val A: Array[Long] = Array.tabulate(32)(i => minhashParams(i)._1)
  private val B: Array[Long] = Array.tabulate(32)(i => minhashParams(i)._2)
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  val schema: StructType = StructType(
    StructField("ss", ArrayType(LongType, containsNull = false)) +:
      (0 until 32).map(i => StructField(s"mh_$i", LongType, nullable = false)))
}

/** `ivf_assign(array<double>)`: k-means argmin assignment — cid of the
  * centroid minimizing (c·c − 2 v·c), ties to the lowest cid (the
  * oracle's row_number() OVER (ORDER BY d, cid)). Centroids ride a
  * REFERENCE OBJECT, not literals: the generated code is independent of
  * the centroid values, so every Lloyd iteration (and the final probe)
  * reuses ONE compiled class instead of re-codegenning a k×dims literal
  * tree per job — this, not row throughput, was q36's cost at sandbox
  * scale. Dot products fold left-to-right like DuckDB's
  * list_dot_product, keeping bit parity. */
case class IvfAssignExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  // c·c per centroid, same left-to-right fold as the oracle
  private lazy val ccs: Array[Double] = cents.map { cv =>
    var s = 0.0; var i = 0
    while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
    s
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData].toDoubleArray()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dot = 0.0; var i = 0
      while (i < cv.length) { dot += v(i) * cv(i); i += 1 }
      val d = ccs(c) - 2.0 * dot
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val ccsRef = ctx.addReferenceObj("ivfCcs", ccs, "double[]")
      // all locals via freshName: two instances of this expression may
      // land in one codegen stage, and duplicate declarations would fail
      // Janino compilation (silent interpreted fallback)
      val v = ctx.freshName("ivfV")
      val best = ctx.freshName("ivfBest")
      val bestD = ctx.freshName("ivfBestD")
      val ci = ctx.freshName("ivfCi")
      val cv = ctx.freshName("ivfCv")
      val dot = ctx.freshName("ivfDot")
      val d = ctx.freshName("ivfD")
      val i = ctx.freshName("ivfI")
      s"""
        |double[] $v = $c.toDoubleArray();
        |int $best = -1;
        |double $bestD = Double.MAX_VALUE;
        |for (int $ci = 0; $ci < $centsRef.length; $ci++) {
        |  double[] $cv = $centsRef[$ci];
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $cv.length; $i++) $dot += $v[$i] * $cv[$i];
        |  double $d = $ccsRef[$ci] - 2.0 * $dot;
        |  if ($d < $bestD) { $bestD = $d; $best = $ci; }
        |}
        |${ev.value} = $best;
        |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): IvfAssignExpr =
    copy(child = c)
  override def prettyName: String = "ivf_assign"
}

object GraftFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim

  def url_canonicalize(c: Column): Column =
    ColumnShim.column(UrlCanonicalizeExpr(ColumnShim.expression(c)))
  def simhash64(c: Column): Column =
    ColumnShim.column(SimHash64Expr(ColumnShim.expression(c)))
  def md5_ints4(c: Column): Column =
    ColumnShim.column(Md5Ints4Expr(ColumnShim.expression(c)))
  def minhash_sig(c: Column): Column =
    ColumnShim.column(MinhashSigExpr(ColumnShim.expression(c)))

  /** Register for SQL use in an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "url_canonicalize", es => UrlCanonicalizeExpr(es.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", es => SimHash64Expr(es.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_ints4", es => Md5Ints4Expr(es.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", es => MinhashSigExpr(es.head), "scala_udf")
  }
}

/** SparkSessionExtensions entry point: enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * — registers the graft functions in every session of the cluster
  * (the idiomatic deployment for a shared Spark platform). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("url_canonicalize"),
      new ExpressionInfo(classOf[UrlCanonicalizeExpr].getName, "url_canonicalize"),
      (es: Seq[Expression]) => UrlCanonicalizeExpr(es.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)))
    e.injectFunction((
      new FunctionIdentifier("md5_ints4"),
      new ExpressionInfo(classOf[Md5Ints4Expr].getName, "md5_ints4"),
      (es: Seq[Expression]) => Md5Ints4Expr(es.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSigExpr].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinhashSigExpr(es.head)))
  }
}
