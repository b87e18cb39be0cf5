package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded-state top-k per group: an `Aggregator` whose buffer is the
  * k best (ord, id) pairs seen so far, ordered by (ord DESC, id ASC) —
  * the aggregate-expression answer to "top-N per key" that the
  * window-rank form cannot give: a `row_number() OVER (PARTITION BY k
  * ORDER BY …) <= N` filter SORTS every group's full row set before
  * discarding all but N rows, while this buffer never holds more than
  * k entries, COMBINES MAP-SIDE (each partition ships one ≤k-entry
  * buffer per group, not its rows), and merges in O(k). At 100 TB the
  * shuffle carries O(groups·k) fixed-size buffers instead of the data.
  *
  * The buffer is a descending-sorted array; insert is a linear scan
  * over ≤ k elements (k is small by construction — this is a top-N
  * report, not a sort), merge is one pass over 2k. Plans as an
  * ObjectHashAggregate with a partial phase (asserted in
  * PlanQualitySpec).
  *
  * Ties: (ord, id) is a total order as long as ids are unique within a
  * group — same determinism contract as the window form's
  * `ORDER BY ord DESC, id` tiebreak. */
class TopKPairs(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better than"

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size >= k && !lt(in, buf.last)) buf
    else {
      val at = buf.indexWhere(e => lt(in, e)) match {
        case -1 => buf.size
        case i  => i
      }
      (buf.take(at) :+ in) ++ buf.drop(at) take k
    }
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    // one-pass merge of two sorted buffers, truncated at k
    val out = Vector.newBuilder[(Long, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      val takeA = j >= b.size || (i < a.size && lt(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object TopKPairs {
  /** Register as a callable column function: `top_k_pairs(ord, id)`. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKPairs(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
}
