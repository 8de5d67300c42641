package graft.engine

/** The pluggable URL-seen sketch behind the frontier's dedup
  * prefilter — the "bloom/cuckoo" pair. Both implementations share
  * the sidecar contract the engine relies on:
  *
  *  - blobs are plain byte arrays riding the per-host_bucket side
  *    table (schema `(host_bucket, n, bits)`), appended as per-round
  *    deltas, merged on read inside the dedup cogroup, compacted
  *    every `bloomCompactEvery` rounds;
  *  - NO FALSE NEGATIVES: `maybe_seen=false` bypasses the exact
  *    anti-join, so a sketch may over-approximate (costing an extra
  *    anti-join pass) but never under-approximate;
  *  - instances are shipped INTO tasks (cogroup/mapPartitions
  *    closures), hence Serializable with only primitive state.
  *
  * Selection: [[graft.core.CrawlConfig.seenFilter]] — "bloom"
  * (default; k=5 blocked bloom, 1.25 B/key at ~1% fp) or "cuckoo"
  * ((2,4)-cuckoo with 16-bit fingerprints, ~4 B/key at the sizing
  * floor for ~0.01% fp, O(1) deletion for forget/recrawl flows).
  * Both produce the identical crawl (golden-tested): the sketch only
  * routes candidates between the fast path and the exact anti-join.
  */
sealed trait SeenSketch extends Serializable {
  def empty(): Array[Byte]
  def add(blob: Array[Byte], key: Long): Unit
  def mightContain(blob: Array[Byte], key: Long): Boolean
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte]
}

/** Blocked bloom sized to `numBits` (power of two). */
final case class BloomSketch(numBits: Int) extends SeenSketch {
  def empty(): Array[Byte] = Bloom.empty(numBits)
  def add(blob: Array[Byte], key: Long): Unit = Bloom.add(blob, key)
  def mightContain(blob: Array[Byte], key: Long): Boolean =
    Bloom.mightContain(blob, key)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bloom.or(a, b)
}

/** Cuckoo filter sized for `expectedKeys` per bucket. */
final case class CuckooSketch(expectedKeys: Long) extends SeenSketch {
  def empty(): Array[Byte] = Cuckoo.sizeFor(expectedKeys)
  def add(blob: Array[Byte], key: Long): Unit = Cuckoo.add(blob, key)
  def mightContain(blob: Array[Byte], key: Long): Boolean =
    Cuckoo.mightContain(blob, key)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Cuckoo.merge(a, b)
}
