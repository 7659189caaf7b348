package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (capacity-c frequent-items sketch) as
  * a typed Aggregator — bounded O(c) state per partition where an exact
  * groupBy shuffles the FULL key cardinality. The streaming-classic
  * guarantee: a decrement event destroys c+1 occurrences at once, so at
  * most n/(c+1) decrements ever happen and every item with true count
  * > n/(c+1) is still in the summary at the end (its estimate is within
  * n/(c+1) below truth). Merging two summaries (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) sums counts then subtracts the
  * (c+1)-largest count from everything and drops the non-positive — the
  * errors ADD, so the merged bound stays n/(c+1) over the combined n and
  * the result is partitioning-independent in its guarantee (NOT in its
  * exact counter values — estimates are a property of arrival order,
  * which is why q132 re-counts candidates exactly before emitting).
  *
  * Spark executes this with map-side combine: each partition sends one
  * ≤c-entry map, never its raw keys — the 100 TB posture for "what are
  * the hot keys" over an unbounded-cardinality stream (the diagnostic
  * q63 answers exactly at one-shuffle cost; this answers it at O(c)
  * communication for the candidate-finding pass).
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "MisraGries capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], key: String): Map[String, Long] =
    b.get(key) match {
      case Some(c) => b.updated(key, c + 1L)
      case None if b.size < capacity => b.updated(key, 1L)
      case None =>
        // buffer full + unseen key: decrement everything by one (the new
        // key's single occurrence is consumed by the same event), drop
        // exhausted counters — c+1 occurrences destroyed per event.
        b.iterator.flatMap { case (k, c) =>
          if (c > 1L) Iterator((k, c - 1L)) else Iterator.empty
        }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // keep the top-c by subtracting the (c+1)-largest count everywhere
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      sum.iterator.flatMap { case (k, c) =>
        if (c > cut) Iterator((k, c - cut)) else Iterator.empty
      }.toMap
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
