package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 64-bit SimHash signature as a typed Aggregator (Charikar, "Similarity
  * estimation techniques from rounding algorithms", STOC 2002): folds each token's
  * xxhash64 into 64 signed bit-vote counters in one mutable buffer — one
  * pass, map-side combinable via merge(), no row explosion.
  *
  * This replaces the first q_dedup_simhash formulation, which exploded
  * every word row 64× (one row per bit position) before aggregating — a
  * 64× shuffle-input blowup that caps out long before 100 TB. The
  * per-token hash is [[XxHash64Chain.hashString]], byte-equal to the SQL
  * `xxhash64(word)` (pinned by HashCompatSpec), so the emitted signatures
  * — and therefore the near-dup pairs — are identical to the explode
  * formulation's, row for row.
  *
  * Usage: `words.groupBy($"doc_id").agg(SimHashSig.simhash64($"word"))`.
  */
class SimHashSig extends Aggregator[String, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], token: String): Array[Int] = {
    val h = XxHash64Chain.hashString(token)
    var j = 0
    while (j < 64) {
      buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  /** Bit j is set iff the vote sum is strictly positive (ties → 0), the
    * same rule as the explode formulation's `WHEN s > 0`. */
  override def finish(buf: Array[Int]): Long = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]()
}

object SimHashSig {
  def simhash64(col: Column): Column = udaf(new SimHashSig).apply(col)

  /** Hamming distance between two signatures (for confirm stages). */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
