package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

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
  * Hash families are chosen to be exactly reproducible in portable ANSI
  * SQL (so a DuckDB oracle can replay them bit-for-bit): MinHash uses the
  * classic universal family `(a_i * h + b_i) mod p` with `p = 2^31 - 1`
  * over a pre-reduced 31-bit base hash (all intermediates < 2^62, so the
  * arithmetic is exact in signed 64-bit in any engine); SimHash votes over
  * the bits of the pre-hashed element directly. Both sketches hash each
  * element once per index with fixed-size local state, inside whole-stage
  * codegen.
  */
abstract class SketchOverHashedArray extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint> of pre-hashed elements, got ${dt.sql}")
  }
}

/** 64-minima MinHash signature of a hashed-shingle set.
  *
  * Permutation i is `(a_i * h + b_i) mod p` with `p = 2^31 - 1` and
  * `a_i = (2654435761 (i+1)) mod p`, `b_i = (2246822519 (i+3)) mod p` —
  * the standard universal hash family, chosen over reseeded xxhash64
  * because the whole computation is replayable in any SQL engine (the
  * DuckDB oracle recomputes it term-for-term). Inputs must already be
  * reduced mod p (31-bit), so `a_i * h < 2^62` never overflows. */
case class MinHashSignature(child: Expression) extends SketchOverHashedArray {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    // Empty input short-circuits to the all-zero sentinel: without it the
    // minima stay Long.MaxValue here while a SQL oracle's list_min over an
    // empty list is NULL — the two engines would diverge on empty docs.
    if (n == 0) return new GenericArrayData(new Array[Long](64))
    val sig = Array.fill(64)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val v = hs.getLong(j)
      var i = 0
      while (i < 64) {
        val a = (2654435761L * (i + 1)) % 2147483647L
        val b = (2246822519L * (i + 3)) % 2147483647L
        val h = (a * v + b) % 2147483647L
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
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      s"""
         |long[] $sig = new long[64];
         |int $n = $c.numElements();
         |if ($n > 0) {
         |  java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = $c.getLong($j);
         |    for (int $i = 0; $i < 64; $i++) {
         |      long $a = (2654435761L * ($i + 1)) % 2147483647L;
         |      long $b = (2246822519L * ($i + 3)) % 2147483647L;
         |      long $h = ($a * $v + $b) % 2147483647L;
         |      if ($h < $sig[$i]) $sig[$i] = $h;
         |    }
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
    val n = th.numElements()
    // Empty input → sig 0 (not all-64-bits-set from the 0 >= 0 votes):
    // matches a SQL oracle where the vote sum over an empty list is NULL.
    if (n == 0) return java.lang.Long.valueOf(0L)
    val votes = new Array[Int](64)
    var j = 0
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
         |if ($n > 0) {
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ($votes[$i] >= 0) $sig |= (1L << $i);
         |  }
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
