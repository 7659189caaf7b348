package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with` + `aggregate`) —
  * no UDFs, so the whole expression stays inside whole-stage codegen and
  * runs columnar at any scale (SURVEY §2.C).
  *
  * Elements are cast to DOUBLE before multiplying and accumulated in array
  * index order (Catalyst's `aggregate` folds left), which makes results
  * bit-identical to any engine doing an ordered double-precision loop —
  * the property the DuckDB oracle comparison relies on.
  */
object VectorFunctions {

  /** Dot product of two numeric arrays, accumulated in double — a custom
    * codegen'd Expression (see DotProductDouble; the higher-order
    * `aggregate(zip_with(...))` equivalent allocates an intermediate array
    * per row and dominated the all-pairs kNN profile). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DotProductDouble(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe only in that zero-norm vectors yield
    * NaN/Infinity exactly as the equivalent SQL would. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Hamming distance between two 64-bit signatures (e.g. SimHash). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
