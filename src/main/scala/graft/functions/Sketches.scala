package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Fused sketch expressions for the dedup operators.
  *
  * The higher-order-function formulations (`transform(sequence(0,63), i ->
  * array_min(transform(hs, v -> xxhash64(v, i))))` for MinHash;
  * a per-bit `aggregate` for SimHash) allocate an intermediate array per
  * hash index per row — 64 allocations of |shingles| longs per document —
  * and dominated the near-dup bench profile. Each expression below is one
  * pass over the input with fixed-size local state (64 longs / 64 ints),
  * inside whole-stage codegen.
  *
  * Hash family: XXH64 over the pre-hashed element with the hash index as
  * seed (`XXH64.hashLong(v, i)`) — the same primitive Spark's `xxhash64`
  * builtin uses. These sketches are engine-internal (rows-only checks):
  * their contract is recall against the exact-Jaccard oracle, not a fixed
  * byte layout.
  */
abstract class SketchOverHashedArray extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> of pre-hashed elements, got ${dt.sql}")
  }
}

/** 64-minima MinHash signature of a hashed-shingle set. */
case class MinHashSignature(child: Expression) extends SketchOverHashedArray {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sig = Array.fill(64)(Long.MaxValue)
    var j = 0
    val n = hs.numElements()
    while (j < n) {
      val v = hs.getLong(j)
      var i = 0
      while (i < 64) {
        val h = XXH64.hashLong(v, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      s"""
         |long[] $sig = new long[64];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $v = $c.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($v, $i);
         |    if ($h < $sig[$i]) $sig[$i] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(c)
}

/** 64-bit SimHash of hashed tokens: per-bit signed vote over the bits of
  * each token hash. Bit-identical to the per-bit aggregate formulation. */
case class SimHash64(child: Expression) extends SketchOverHashedArray {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var j = 0
    val n = th.numElements()
    while (j < n) {
      val v = th.getLong(j)
      var i = 0
      while (i < 64) {
        votes(i) += (((v >>> i) & 1L).toInt * 2) - 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) >= 0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $votes = new int[64];
         |int $n = $c.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  long $v = $c.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += ((int) (($v >>> $i) & 1L)) * 2 - 1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] >= 0) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object Sketches {
  def minhashSignature(hashedShingles: Column): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(hashedShingles)))
  def simhash64(hashedTokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashedTokens)))
}
