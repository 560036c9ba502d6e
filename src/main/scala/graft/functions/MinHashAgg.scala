package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.L): a MinHash-signature
  * `Aggregator[IN, BUF, OUT]` — the buffer is the running array of
  * per-seed minima, merged element-wise, so the aggregation is a
  * commutative monoid: partial (map-side) signatures combine across any
  * partitioning without a second pass. At 100 TB this is the difference
  * between shuffling 16 longs per group and shipping raw shingle sets.
  *
  * Hash: 64-bit FNV-1a over (seed, shingle chars) — engine-portable and
  * dependency-free (xxhash64 is only exposed as a Column function, not a
  * Scala-side hash; signatures are compared Spark-to-Spark anyway).
  */
class MinHashSignature(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  private def fnv1a(seed: Int, s: String): Long = {
    var h = 0xcbf29ce484222325L ^ seed.toLong
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      val h = fnv1a(k, shingle)
      if (h < buf(k)) buf(k) = h
      k += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (b(k) < a(k)) a(k) = b(k)
      k += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
