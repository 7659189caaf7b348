package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise min/max over equal-length numeric arrays — the mergeable
  * per-dimension statistics pass a feature-scaling pipeline runs before
  * normalization (§2.C typed-Aggregator surface, alongside TopKAggregator).
  *
  * The buffer is a pair of fixed-width arrays (mins, maxs): O(dim) state,
  * associative + commutative merge, so Spark executes it with full
  * map-side combine — one O(dim) row per partition crosses the wire, never
  * the vectors. Doubles here are SELECTED (never derived), so downstream
  * arithmetic on them is engine-exact.
  *
  * NaN contract (ADVICE r10): inputs are REQUIRED NaN-free and a NaN
  * fails loudly. Java `<`/`>` are false for NaN, so silently admitting
  * one would skip it here while Spark's native min/max and DuckDB both
  * treat NaN as the GREATEST double — a cross-engine divergence that
  * would corrupt q116's oracle parity without a visible error. The
  * embeddings fixture is NaN-free by construction; a pipeline with dirty
  * floats must filter/impute before this aggregator (the same posture as
  * the raise_error id-collision guards in Similarity).
  */
class ElemMinMaxAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Array[Double]), (Seq[Double], Seq[Double])] {

  override def zero: (Array[Double], Array[Double]) =
    (Array.fill(dim)(Double.PositiveInfinity),
      Array.fill(dim)(Double.NegativeInfinity))

  override def reduce(b: (Array[Double], Array[Double]),
      in: Seq[Float]): (Array[Double], Array[Double]) = {
    require(in.length == dim, s"expected $dim dims, got ${in.length}")
    var i = 0
    while (i < dim) {
      val v = in(i).toDouble
      require(!v.isNaN, s"NaN at dim $i: ElemMinMaxAggregator requires " +
        "NaN-free input (see NaN contract in the class scaladoc)")
      if (v < b._1(i)) b._1(i) = v
      if (v > b._2(i)) b._2(i) = v
      i += 1
    }
    b
  }

  override def merge(a: (Array[Double], Array[Double]),
      b: (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
    var i = 0
    while (i < dim) {
      if (b._1(i) < a._1(i)) a._1(i) = b._1(i)
      if (b._2(i) > a._2(i)) a._2(i) = b._2(i)
      i += 1
    }
    a
  }

  override def finish(r: (Array[Double], Array[Double])): (Seq[Double], Seq[Double]) =
    (r._1.toSeq, r._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Double], Array[Double])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Double])]()

  override def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Seq[Double])]()
}
