package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.engine.Bloom

/** Typed bloom-filter aggregator (SURVEY.md §2.8 U2): builds a bloom
  * bit-array over a Long key column with map-side partial aggregation —
  * partials merge by bitwise OR, so the shuffle carries one blob per
  * partition instead of the raw keys. Usable as a `TypedColumn` via
  * `BloomAggregator(bits).toColumn` or registered for SQL with
  * `spark.udf.register("bloom_agg", udaf(new BloomAggregator(bits)))`.
  *
  * (The crawl engine's per-bucket bloom build uses mapGroups — chosen
  * for the driver-side blob cache; this Aggregator is the shuffle-side
  * equivalent for pipelines that want the sketch as a column.)
  */
final class BloomAggregator(numBits: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(numBits >= 8 && (numBits & (numBits - 1)) == 0, "numBits must be a power of two")

  override def zero: Array[Byte] = Bloom.empty(numBits)

  override def reduce(buf: Array[Byte], key: Long): Array[Byte] = {
    Bloom.add(buf, key)
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Bloom.or(a, b)

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
