package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the top-k (score DESC, id ASC) pairs per
  * group — the §2.C custom-aggregation surface, in the shape that scales:
  * the buffer is a bounded sorted array, so map-side partial aggregation
  * reduces every partition to ≤ k rows per group BEFORE the shuffle, and
  * the merge is an O(k) sorted-array merge. A window row_number over the
  * raw rows shuffles everything and sorts whole partitions; this shuffles
  * k rows per (group × partition).
  *
  * Determinism: the (score DESC, id ASC) order is total, so the result is
  * independent of partitioning and merge order.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && !better(in, buf.last)) buf
    else {
      val (before, after) = buf.span(better(_, in))
      (before :+ in) ++ after.take(k - before.length - 1)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
