package graft.engine

import graft.core.Hashing

/** (2,4)-cuckoo filter over Long keys — the second URL-seen sketch of
  * the frontier's "bloom/cuckoo" prefilter pair (Fan et al., "Cuckoo
  * Filter: Practically Better than Bloom", CoNEXT 2014 — public
  * knowledge). 16-bit fingerprints, 4 slots per bucket, partial-key
  * cuckooing: a key's two candidate buckets are `i` and
  * `i XOR h(fp)`, so relocation needs only (bucket, fp) — which is
  * also what makes blob MERGE possible without the original keys.
  *
  * Layout (one `Array[Byte]` blob, same sidecar shape as [[Bloom]]):
  * byte 0 = sticky overflow flag, then 4×numBuckets little-endian
  * 16-bit fingerprint slots (0 = empty). numBuckets is a power of two.
  *
  * THE invariant (shared with [[Bloom]], engine-load-bearing: a
  * `maybe_seen=false` tag bypasses the exact anti-join): NO FALSE
  * NEGATIVES. Anything that could lose a fingerprint — an insert
  * failing after MaxKicks, a merge overflowing a bucket — sets the
  * sticky overflow flag instead, after which `mightContain` answers
  * true unconditionally: the filter degrades to "route every candidate
  * through the exact anti-join", which is correct, just slower — and
  * PERMANENT for that blob's lineage (the overflow drops fingerprints,
  * so no merge or compaction can rebuild the table; only re-deriving
  * from the exact seen table could, which is a store rebuild, not a
  * maintenance pass). The engine therefore sizes each bucket's table
  * for its WORST-case population (mega-host concentration included) at
  * ≤ 50% slot load, where kick-failure is vanishingly rare — the
  * degraded mode is a safety net, not an operating state.
  *
  * Why offer it next to bloom at 10^10 URLs: comparable space
  * (2 B/key at fp ≈ 2·4/2^16 ≈ 0.012% vs bloom's 1.25 B/key at
  * fp ≈ 1%) with two properties bloom lacks — O(1) [[remove]] (a
  * forget/recrawl deletes one fingerprint instead of rebuilding the
  * bucket's filter from scratch) and bounded probe cost (2 cache lines
  * per lookup vs k=5 scattered bits).
  */
object Cuckoo {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  private val Header = 1 // overflow flag byte

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Blob sized for `expected` keys at ≤ 50% slot load (power-of-two
    * buckets). ~4 B/key at the sizing floor — the safety margin that
    * keeps kick-failure (and so the degraded full-anti-join mode)
    * out of steady-state operation. Buckets cap at 2^26 (~512 MB
    * blob): above ~134M expected keys per host bucket the ≤50%-load
    * design target is no longer honored and the table WILL run into
    * sticky overflow (safe — never a false negative — but the
    * prefilter degrades toward a no-op for that bucket); the cap is
    * logged so the degraded-by-construction sizing is visible. Fix
    * the configuration, not the cap: raise `CrawlConfig.numBuckets`
    * so per-bucket keys shrink. */
  def sizeFor(expected: Long): Array[Byte] = {
    val slotsNeeded = math.max(64L, expected * 2L)
    var buckets = 16
    while (buckets.toLong * SlotsPerBucket < slotsNeeded && buckets < (1 << 26))
      buckets <<= 1
    if (buckets.toLong * SlotsPerBucket < slotsNeeded)
      log.warn(s"cuckoo sizeFor($expected) hit the 2^26-bucket cap: " +
        s"table holds ${buckets.toLong * SlotsPerBucket / 2} keys at the " +
        "50% design load and will degrade to sticky overflow beyond it " +
        "(no false negatives, weak prefilter) — raise CrawlConfig." +
        "numBuckets ON A FRESH STORE only: changing it on an existing " +
        "store remaps every host's bucket and resume fails fast " +
        "(validateSeenFilter pins num_buckets in the frontier props)")
    new Array[Byte](Header + buckets * SlotsPerBucket * 2)
  }

  def numBuckets(blob: Array[Byte]): Int = (blob.length - Header) / (SlotsPerBucket * 2)

  def overflowed(blob: Array[Byte]): Boolean = blob(0) != 0

  private def fpOf(key: Long): Int = {
    val f = (Hashing.splitmix64(key) >>> 48).toInt & 0xFFFF
    if (f == 0) 1 else f
  }

  private def bucketOf(key: Long, nb: Int): Int =
    (Hashing.splitmix64(Hashing.splitmix64(key)) & (nb - 1)).toInt

  /** The alternate bucket of (bucket, fp) — symmetric, so it also maps
    * the alternate back to the primary. */
  def altBucket(bucket: Int, fp: Int, nb: Int): Int =
    (bucket ^ Hashing.splitmix64(fp.toLong).toInt) & (nb - 1)

  private def slot(blob: Array[Byte], bucket: Int, s: Int): Int = {
    val off = Header + (bucket * SlotsPerBucket + s) * 2
    ((blob(off) & 0xFF) | ((blob(off + 1) & 0xFF) << 8))
  }

  private def setSlot(blob: Array[Byte], bucket: Int, s: Int, fp: Int): Unit = {
    val off = Header + (bucket * SlotsPerBucket + s) * 2
    blob(off) = (fp & 0xFF).toByte
    blob(off + 1) = ((fp >>> 8) & 0xFF).toByte
  }

  private def tryInsertAt(blob: Array[Byte], bucket: Int, fp: Int): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(blob, bucket, s) == 0) { setSlot(blob, bucket, s, fp); return true }
      s += 1
    }
    false
  }

  /** Insert (bucket, fp) with relocation; sticky overflow on failure. */
  def insertFp(blob: Array[Byte], bucket: Int, fp: Int): Unit = {
    if (overflowed(blob)) return
    val nb = numBuckets(blob)
    val b1 = bucket & (nb - 1)
    val b2 = altBucket(b1, fp, nb)
    if (tryInsertAt(blob, b1, fp) || tryInsertAt(blob, b2, fp)) return
    // kick loop: evict a deterministic victim (rotating slot choice).
    // Never evict a copy of the fingerprint being placed when a
    // different victim exists — swapping fp for fp is a no-op that
    // ping-pongs between the pair's two buckets until MaxKicks when
    // several copies of one fingerprint saturate them (duplicate keys,
    // or a 16-bit fp-collision cluster), overflowing a near-empty
    // table. With the skip, overflow needs the pair genuinely full.
    var curB = b1
    var curFp = fp
    var kick = 0
    while (kick < MaxKicks) {
      var victim = kick % SlotsPerBucket
      var probed = 0
      while (slot(blob, curB, victim) == curFp && probed < SlotsPerBucket) {
        victim = (victim + 1) % SlotsPerBucket
        probed += 1
      }
      val evicted = slot(blob, curB, victim)
      setSlot(blob, curB, victim, curFp)
      curFp = evicted
      curB = altBucket(curB, curFp, nb)
      if (tryInsertAt(blob, curB, curFp)) return
      kick += 1
    }
    blob(0) = 1 // sticky overflow — degrade, never lose
  }

  def add(blob: Array[Byte], key: Long): Unit = {
    val nb = numBuckets(blob)
    insertFp(blob, bucketOf(key, nb), fpOf(key))
  }

  def mightContain(blob: Array[Byte], key: Long): Boolean = {
    if (overflowed(blob)) return true
    val nb = numBuckets(blob)
    val fp = fpOf(key)
    val b1 = bucketOf(key, nb)
    val b2 = altBucket(b1, fp, nb)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(blob, b1, s) == fp || slot(blob, b2, s) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one copy of the key's fingerprint. Only sound for keys
    * actually inserted (standard cuckoo-filter contract — removing a
    * never-inserted key could strip a colliding key's fingerprint).
    * Returns false (and changes nothing) if absent or overflowed. */
  def remove(blob: Array[Byte], key: Long): Boolean = {
    if (overflowed(blob)) return false
    val nb = numBuckets(blob)
    val fp = fpOf(key)
    val b1 = bucketOf(key, nb)
    val b2 = altBucket(b1, fp, nb)
    var s = 0
    while (s < SlotsPerBucket) {
      if (slot(blob, b1, s) == fp) { setSlot(blob, b1, s, 0); return true }
      if (slot(blob, b2, s) == fp) { setSlot(blob, b2, s, 0); return true }
      s += 1
    }
    false
  }

  /** Merge-on-read union: reinsert every occupied slot of `b` into a
    * copy of `a` (possible because a slot's (bucket, fp) determines
    * both candidate buckets). Defined ONLY for equal-sized tables — a
    * key's home bucket is a function of the table size, so rehoming
    * across sizes could silently violate the no-false-negative
    * contract; a mixed-size merge therefore degrades (sticky
    * overflow) instead of guessing. The engine sizes all of a
    * bucket's delta blobs from the same expected count, so the
    * degraded path never runs in normal operation. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    val out = java.util.Arrays.copyOf(big, big.length)
    if (overflowed(small) || small.length != big.length) { out(0) = 1; return out }
    val nb = numBuckets(small)
    var bucket = 0
    while (bucket < nb) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = slot(small, bucket, s)
        if (fp != 0) insertFp(out, bucket, fp)
        s += 1
      }
      bucket += 1
    }
    out
  }
}
