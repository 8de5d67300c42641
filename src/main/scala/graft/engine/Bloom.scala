package graft.engine

import graft.core.Hashing

/** Simple blocked bloom filter over Long keys (SURVEY.md §2.4 A2 /
  * §2.8 U2): per-host_bucket membership sketch for the URL-seen
  * prefilter. k probe positions are derived from the xxhash64 key via
  * SplitMix64 remixes, so there is nothing to coordinate across JVMs.
  * Filters merge by bitwise OR — round deltas are built per bucket and
  * OR-ed into the running filter.
  *
  * No false negatives by construction; false positives only cost an
  * extra pass through the exact anti-join (which remains the truth, so
  * no URL can be wrongly dropped — SURVEY.md §7.3 item 5).
  */
object Bloom {
  val NumHashes = 5

  /** numBits must be a power of two. */
  def empty(numBits: Int): Array[Byte] = new Array[Byte](numBits / 8)

  def add(bits: Array[Byte], key: Long): Unit = {
    val mask = bits.length * 8 - 1
    var i = 0
    var h = key
    while (i < NumHashes) {
      h = Hashing.splitmix64(h)
      val pos = (h & mask).toInt
      bits(pos >>> 3) = (bits(pos >>> 3) | (1 << (pos & 7))).toByte
      i += 1
    }
  }

  def mightContain(bits: Array[Byte], key: Long): Boolean = {
    val mask = bits.length * 8 - 1
    var i = 0
    var h = key
    while (i < NumHashes) {
      h = Hashing.splitmix64(h)
      val pos = (h & mask).toInt
      if ((bits(pos >>> 3) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val n = math.max(a.length, b.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (i < a.length) a(i) else 0
      val y = if (i < b.length) b(i) else 0
      out(i) = (x | y).toByte
      i += 1
    }
    out
  }

  /** Size (bits, power of two) for expected n keys at ~1% fp. */
  def sizeFor(expected: Long): Int = {
    val target = math.max(1024L, expected * 10L)
    var bits = 1024
    while (bits < target && bits < (1 << 28)) bits <<= 1
    bits
  }
}
