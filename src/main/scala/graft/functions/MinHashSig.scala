package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import net.jpountz.xxhash.XXHashFactory

/** MinHash signature as a reusable typed Aggregator (SURVEY §4 custom-work
  * item 2): folds a stream of tokens into a k-permutation min-signature in
  * a single mutable buffer — one pass, map-side combinable via merge(), no
  * row explosion.
  *
  * The per-seed hash is xxhash64 over the token's UTF-8 bytes (the same
  * public algorithm Spark's built-in `xxhash64` uses via lz4-java, though
  * over raw bytes rather than Spark's typed encoding, so signatures from
  * this aggregator are self-consistent but intentionally not byte-equal to
  * the expression form used in q_dedup_minhash).
  *
  * Usage: `df.groupBy($"doc_id").agg(MinHashSig.minhash32($"word"))`.
  */
class MinHashSig(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {
  @transient private lazy val hasher = XXHashFactory.fastestInstance().hash64()

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    val bytes = token.getBytes("UTF-8")
    var s = 0
    while (s < k) {
      val h = hasher.hash(bytes, 0, bytes.length, s)
      if (h < buf(s)) buf(s) = h
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashSig {
  /** 32-permutation signature column aggregator. */
  def minhash32(col: Column): Column = udaf(new MinHashSig(32)).apply(col)

  /** Signature-estimated Jaccard: fraction of matching components. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    var m = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
    if (n == 0) 0.0 else m.toDouble / n
  }
}
