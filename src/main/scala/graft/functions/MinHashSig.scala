package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MinHash signature as a reusable typed Aggregator (SURVEY §4 custom-work
  * item 2; Broder, "On the resemblance and containment of documents",
  * SEQUENCES 1997): folds a stream of tokens into a k-permutation min-signature in
  * a single mutable buffer — one pass, map-side combinable via merge(), no
  * row explosion.
  *
  * The per-(token, seed) hash is [[XxHash64Chain.hashStringInt]], which is
  * byte-equal to the SQL expression `xxhash64(token, lit(seed))` (pinned by
  * HashCompatSpec on the real corpus): the token's UTF-8 xxhash64 under
  * Spark's seed 42 seeds one standard xxHash64 int round over the seed
  * value. Signatures from this aggregator are therefore drop-in identical
  * to the 32-MIN-aggregate expression formulation q_dedup_minhash first
  * shipped with — same bands, same candidates, same confirmed pairs — while
  * hashing each token's bytes ONCE for all k permutations instead of k
  * times.
  *
  * Usage: `words.groupBy($"doc_id").agg(MinHashSig.minhash32($"word"))`.
  */
class MinHashSig(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    val base = XxHash64Chain.hashString(token)
    var s = 0
    while (s < k) {
      val h = XxHash64Chain.hashInt(s, base)
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
