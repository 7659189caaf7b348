package graft.sources.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.PartTransforms

/** The catalog's `FunctionCatalog` surface: the partition-transform
  * functions a `PARTITIONED BY (bucket(8, k), months(d))` write
  * distribution resolves against (the Iceberg pattern — Spark's
  * `RequiresDistributionAndOrdering` turns transform clustering into a
  * shuffle on these functions, bound here). Each function delegates to
  * [[PartTransforms]], the SAME derivation the per-row writer and the
  * scan's filter-literal pruning use — the three sides cannot drift.
  *
  * Every bound function carries the Spark "magic" `invoke` method (the
  * codegen'd path) AND `produceResult` (the interpreted fallback). */
object GraftPartFunctions {
  def load(ident: Identifier): UnboundFunction =
    ident.name().toLowerCase(java.util.Locale.ROOT) match {
      case "bucket" => BucketUnbound
      case "months" => DateUnbound("months")
      case "days" => DateUnbound("days")
      case "years" => DateUnbound("years")
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  def exists(ident: Identifier): Boolean =
    Set("bucket", "months", "days", "years")(
      ident.name().toLowerCase(java.util.Locale.ROOT))
}

object BucketUnbound extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col) - stable hash bucket in [0, n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, col), got $inputType")
    inputType.fields(1).dataType match {
      case LongType => BucketLong
      case IntegerType => BucketInt
      case StringType => BucketString
      case other => throw new UnsupportedOperationException(
        s"graft bucket: unsupported key type $other")
    }
  }
}

sealed abstract class BucketBound(keyType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket($keyType)"
  override def isResultNullable: Boolean = false
}

object BucketLong extends BucketBound(LongType) {
  def invoke(n: Int, v: Long): Int = PartTransforms.bucketOfLong(v, n)
  override def produceResult(input: InternalRow): Integer =
    invoke(input.getInt(0), input.getLong(1))
}

object BucketInt extends BucketBound(IntegerType) {
  def invoke(n: Int, v: Int): Int = PartTransforms.bucketOfLong(v.toLong, n)
  override def produceResult(input: InternalRow): Integer =
    invoke(input.getInt(0), input.getInt(1))
}

object BucketString extends BucketBound(StringType) {
  def invoke(n: Int, v: UTF8String): Int =
    PartTransforms.bucketOfString(v.toString, n)
  override def produceResult(input: InternalRow): Integer =
    invoke(input.getInt(0), input.getUTF8String(1))
}

final case class DateUnbound(fn: String) extends UnboundFunction {
  override def name(): String = fn
  override def description(): String = s"$fn(date) - partition transform"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
        inputType.fields(0).dataType == DateType,
      s"$fn takes one DATE column, got $inputType")
    DateBound(fn)
  }
}

final case class DateBound(fn: String) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(DateType)
  override def resultType(): DataType = IntegerType
  override def name(): String = fn
  override def canonicalName(): String = s"graft.$fn(date)"
  override def isResultNullable: Boolean = false
  def invoke(epochDay: Int): Int = fn match {
    case "months" => PartTransforms.monthsInt(epochDay)
    case "days" => epochDay
    case "years" => PartTransforms.yearsInt(epochDay)
  }
  override def produceResult(input: InternalRow): Integer =
    invoke(input.getInt(0))
}
