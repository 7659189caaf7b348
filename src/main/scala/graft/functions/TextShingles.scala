package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused distinct word n-gram expression.
  *
  * Semantically identical to
  * `array_distinct(transform(sequence(1, size(toks)-n+1),
  *    i -> concat_ws(' ', slice(toks, i, n))))`
  * (first-occurrence order), with the short-input branch selected by
  * `shortFallback`: distinct tokens (the near-dup shingle convention, so a
  * 2-word doc can still match its duplicate) or an empty array (the
  * decontamination convention — a <n-token doc has no n-grams to share).
  *
  * The higher-order formulation runs interpreted (HOFs are CodegenFallback)
  * and allocates a sequence array, one slice array and one concat per
  * position, then an O(n²)-ish array_distinct — ~4 s for 250 k shingles at
  * sf0.1, the dominant cost of every shingle-based operator. This is one
  * codegen pass with a LinkedHashSet: same output, ~10×.
  */
case class WordNgrams(child: Expression, n: Int, shortFallback: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"expected array<string> of tokens, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sz = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (sz >= n) {
      var i = 0
      while (i + n <= sz) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(WordNgrams.Space, parts: _*))
        i += 1
      }
    } else if (shortFallback) {
      var i = 0
      while (i < sz) { out.add(toks.getUTF8String(i)); i += 1 }
    }
    val arr = out.toArray(new Array[AnyRef](out.size()))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sz = ctx.freshName("sz")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val parts = ctx.freshName("parts")
      val fallbackLoop =
        if (shortFallback)
          s"""for (int $i = 0; $i < $sz; $i++) {
             |  $set.add($c.getUTF8String($i));
             |}""".stripMargin
        else ""
      s"""
         |int $sz = $c.numElements();
         |java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String> $set =
         |  new java.util.LinkedHashSet<org.apache.spark.unsafe.types.UTF8String>();
         |if ($sz >= $n) {
         |  for (int $i = 0; $i + $n <= $sz; $i++) {
         |    org.apache.spark.unsafe.types.UTF8String[] $parts =
         |      new org.apache.spark.unsafe.types.UTF8String[$n];
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $c.getUTF8String($i + $j);
         |    }
         |    $set.add(org.apache.spark.unsafe.types.UTF8String.concatWs(
         |      graft.functions.WordNgrams.Space(), $parts));
         |  }
         |} else {
         |  $fallbackLoop
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $set.toArray(new Object[$set.size()]));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
}

object WordNgrams {
  val Space: UTF8String = UTF8String.fromString(" ")
}

/** Fused md5-derived 60-bit hash of every string in an array —
  * element-for-element equal to
  * `transform(arr, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) [% mod])`,
  * the portable hash family the dedup sketches replay in the DuckDB oracle
  * (the first 15 hex chars of md5 are the digest's first 60 bits,
  * big-endian). The declarative form pays interpreted-HOF dispatch plus a
  * hex round-trip (bytes → hex string → substring → parse) per element;
  * this is one digest + shift per element inside codegen. */
case class Md5HashArray(child: Expression, mod: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"expected array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5HashArray.hash60(arr.getUTF8String(i), mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.Md5HashArray.hash60(
         |    $c.getUTF8String($i), ${mod}L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Md5HashArray = copy(child = c)
}

object Md5HashArray {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) (== first 15 hex chars parsed base-16),
    * optionally reduced mod `mod` (pass 0 for the raw 60-bit value). */
  def hash60(s: UTF8String, mod: Long): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // First 8 bytes big-endian, then drop the low nibble: 64 → 60 bits.
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    val h = v >>> 4
    if (mod > 0) h % mod else h
  }
}

object TextShingles {
  /** Distinct word n-grams; short inputs fall back to distinct tokens. */
  def wordNgrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(tokens), n, shortFallback = true))

  /** Distinct word n-grams; short inputs yield an empty array. */
  def wordNgramsStrict(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(tokens), n, shortFallback = false))

  /** md5-60-bit hashes of each element, reduced mod 2^31-1 (MinHash base). */
  def md5Hash31Array(arr: Column): Column =
    ColumnBridge.column(Md5HashArray(ColumnBridge.expression(arr), 2147483647L))

  /** Raw md5-60-bit hashes of each element (SimHash token hashes). */
  def md5Hash60Array(arr: Column): Column =
    ColumnBridge.column(Md5HashArray(ColumnBridge.expression(arr), 0L))
}
