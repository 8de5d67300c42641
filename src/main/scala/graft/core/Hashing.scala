package graft.core

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** JVM-side hashing that agrees bit-for-bit with Spark SQL built-ins, so
  * the single-threaded reference simulator and the Spark engine compute
  * identical url hashes and bucket assignments (BASELINE.json:6
  * "canonicalized xxHash64 URLs").
  */
object Hashing {
  /** Identical to Spark SQL `xxhash64(stringCol)` (seed 42). */
  def xxhash64(s: String): Long =
    XXH64.hashUTF8String(UTF8String.fromString(s), 42L)

  /** Identical to Spark SQL `pmod(xxhash64(host), n)`. */
  def hostBucket(host: String, numBuckets: Int): Int = {
    val h = xxhash64(host)
    val m = h % numBuckets
    (if (m < 0) m + numBuckets else m).toInt
  }

  /** SplitMix64 — deterministic PRNG stream used by the synthetic web
    * generator (public-domain algorithm, Steele et al., OOPSLA'14). */
  def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic stream: k-th draw from seed. */
  def draw(seed: Long, k: Int): Long = splitmix64(seed + k * 0x632be59bd9b4e019L)

  /** Non-negative modulus helper. */
  def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  /** Child discovered_seq for the k-th link of a parent with sequence
    * `parent`: the dense encoding parent*64 + 1 + k (≤ 63 links/page)
    * while it fits in a Long (~10 discovery hops from a seed); past
    * that depth, a SplitMix64 remix of (parent, k) masked to positive —
    * still deterministic and parallelism-invariant, so the engine and
    * the reference simulator stay in lockstep at any crawl depth.
    * (Collisions in the deep regime are ~2⁻⁶³-rare and only perturb a
    * tie-break; total order falls back to url_hash.) */
  def childSeq(parent: Long, k: Int): Long =
    if (parent < (Long.MaxValue - 64L) / 64L) parent * 64L + 1L + k
    else splitmix64(parent ^ (k + 1L) * 0x9E3779B97F4A7C15L) & Long.MaxValue
}
