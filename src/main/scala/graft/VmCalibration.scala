package graft

/** ~2 s memory-system calibration probe attached to every bench run
  * (round-5 verdict #1: the official record kept sampling the VM's
  * bimodal interference phase with nothing in the record to prove it).
  *
  * What it measures is exactly the §3 ceiling mechanism from
  * BENCH/BASELINE.md: a crawl round is allocation/copy-bound, so its
  * throughput tracks the shared memory bus, not core count. The probe
  * times (a) single-thread large-array copy bandwidth, (b) the same
  * copy on 8 threads, (c) small-object allocation rate — the three
  * controls used to establish the ~0.75 efficiency ceiling. A bench
  * record carrying these numbers is self-diagnosing: a degraded
  * sample shows probe bandwidth below the good-phase floor, so a low
  * efficiency number can be attributed to the box from the JSON
  * alone.
  *
  * Floors (measured on this VM, round 6 — see BENCH/BASELINE.md §7):
  * good-phase single-thread copy lands well above `MemGbps1Floor`;
  * interference phases cut observed copy bandwidth by 25–40%, the
  * same band as the crawl-throughput swings. `mode` is "degraded"
  * when EITHER copy measurement sits below its floor, else "ok".
  * Floors are env-overridable for other boxes
  * (SPARK_GRAFT_VM_GBPS1_FLOOR / SPARK_GRAFT_VM_GBPS8_FLOOR). */
object VmCalibration {

  final case class Probe(memGbps1: Double, memGbps8: Double,
      memScale8: Double, allocMops: Double) {
    def json: String =
      f"""{"mem_gbps_1t":$memGbps1%.2f,"mem_gbps_8t":$memGbps8%.2f,""" +
        f""""mem_scale_8t":$memScale8%.3f,"alloc_mops":$allocMops%.1f}"""
  }

  val MemGbps1Floor: Double =
    sys.env.get("SPARK_GRAFT_VM_GBPS1_FLOOR").map(_.toDouble).getOrElse(5.5)
  val MemGbps8Floor: Double =
    sys.env.get("SPARK_GRAFT_VM_GBPS8_FLOOR").map(_.toDouble).getOrElse(34.0)

  def mode(p: Probe): String =
    if (p.memGbps1 < MemGbps1Floor || p.memGbps8 < MemGbps8Floor) "degraded"
    else "ok"

  /** Copy bandwidth of one thread over `mb`-MiB arrays for ~`ms` ms
    * (GB/s counted as bytes moved — read+write would double it;
    * single-sided keeps the number comparable to the §3 control). */
  private def copyBandwidth(mb: Int, ms: Long): Double = {
    val n = mb * 1024 * 1024
    val src = new Array[Byte](n)
    val dst = new Array[Byte](n)
    java.util.Arrays.fill(src, 7.toByte)
    // warm: one full pass faults the pages in
    System.arraycopy(src, 0, dst, 0, n)
    var bytes = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < ms * 1000000L) {
      System.arraycopy(src, 0, dst, 0, n)
      bytes += n
    }
    val secs = (System.nanoTime() - t0) / 1e9
    bytes / secs / 1e9
  }

  /** Aggregate copy bandwidth of `threads` concurrent copiers. */
  private def copyBandwidthMt(threads: Int, mb: Int, ms: Long): Double = {
    val results = new Array[Double](threads)
    val start = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        val n = mb * 1024 * 1024
        val src = new Array[Byte](n)
        val dst = new Array[Byte](n)
        java.util.Arrays.fill(src, 7.toByte)
        System.arraycopy(src, 0, dst, 0, n)
        start.await()
        var bytes = 0L
        val t0 = System.nanoTime()
        while (System.nanoTime() - t0 < ms * 1000000L) {
          System.arraycopy(src, 0, dst, 0, n)
          bytes += n
        }
        results(i) = bytes / ((System.nanoTime() - t0) / 1e9) / 1e9
      })
      t.start(); t
    }
    start.countDown()
    ts.foreach(_.join())
    results.sum
  }

  /** Small-object allocation rate (millions of 4 KiB arrays per
    * second) — the GC-pressure control. A rolling sink defeats scalar
    * replacement without retaining the garbage. */
  private def allocRate(ms: Long): Double = {
    val sink = new Array[Array[Byte]](64)
    var i = 0L
    val t0 = System.nanoTime()
    while (System.nanoTime() - t0 < ms * 1000000L) {
      sink((i & 63L).toInt) = new Array[Byte](4096)
      i += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    if (sink((i - 1 & 63L).toInt) == null) -1.0 // keep sink live
    else i / secs / 1e6
  }

  /** Run the full probe: 3×~0.25 s 1-thread copy (best-of — a single
    * shot dips 25% on scheduler noise alone; round 8 widened 2→3
    * samples after a flicker regime where consecutive probes straddled
    * the floor by <10% while the crawl ran at record levels — max can
    * only rise, so the wider best-of reduces false-degraded labels
    * without ever masking a true storm, whose samples ALL sit 30–40%
    * under the floor) + ~0.5 s 8-thread copy + 2×~0.15 s alloc (plus
    * page-fault warmup) ≈ 1.5–2.5 s. Best-of is the right estimator
    * here: interference can only SLOW a copy, so the max is the
    * least-contended sample of the current phase. */
  def run(): Probe = {
    val g1 = Seq(copyBandwidth(mb = 64, ms = 250),
      copyBandwidth(mb = 64, ms = 250),
      copyBandwidth(mb = 64, ms = 250)).max
    val g8 = copyBandwidthMt(threads = 8, mb = 32, ms = 500)
    val alloc = math.max(allocRate(ms = 150), allocRate(ms = 150))
    Probe(g1, g8, g8 / 8.0 / math.max(1e-9, g1), alloc)
  }

  /** Standalone: print N probes (default 3) for floor calibration. */
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3
    (1 to n).foreach { i =>
      val p = run()
      println(s"[vmprobe] $i ${p.json} mode=${mode(p)}")
    }
  }
}
