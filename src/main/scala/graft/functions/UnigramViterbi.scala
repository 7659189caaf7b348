package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused unigram-LM (SentencePiece-shape) Viterbi segmenter — the
  * map-backed scale path the SQL fold in
  * `operators/TextAnalysis.uniFwdSk`/`uniBtSk`/`uniToksSk` documents
  * (r15 verdict #1): semantically IDENTICAL to composing those three
  * `aggregate`/`transform` skeletons over a `(pl, cl)` piece list, but
  * one imperative pass per word with an O(1) hash lookup per candidate
  * piece instead of `array_position`'s O(vocab) scan — at a production
  * 32k vocabulary that scan is a 400× constant on the inner loop, and
  * the fold's generated code (4 inlined lookup terms × forward +
  * backtrack) is large enough to churn the JIT code cache, which the
  * r15 bench measured as both q223's 18 s spread and a same-plan
  * slowdown of the queries that RUN AFTER it in suite order.
  *
  * Semantics (exact-integer objective, hash-locked to the DuckDB oracle
  * that replays the SQL fold):
  *   cost(p)   = 10^12 − cnt(p)
  *   fw(0)     = 0
  *   fw(i)     = min over k ∈ 1..4, k ≤ i, word[i−k..i) ∈ vocab of
  *               fw(i−k) + cost(piece); a missing piece contributes the
  *               4·10^15 sentinel (singles are always in vocab, so every
  *               position is reachable and the sentinel never wins).
  *   backtrack from pos = len: take the LONGEST k ∈ {4,3,2} whose piece
  *   is in vocab and achieves fw(pos−k) + cost = fw(pos), else k = 1 —
  *   the same longest-piece-first tie-break as `uniBtSk`'s CASE ladder.
  *
  * The vocabulary rides IN the expression (a Viterbi vocabulary is
  * KB-sized driver metadata, like a literal): the per-partition cost is
  * one transient hash map, and the dictionary frame — the only input —
  * stays a one-pass map job. Codegen emits a single virtual call on the
  * referenced expression object, so the surrounding projection stays
  * inside whole-stage codegen.
  */
case class UnigramEncode(child: Expression, pieces: Seq[String],
    cnts: Seq[Long]) extends UnaryExpression {
  require(pieces.length == cnts.length,
    "piece/count lists must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"expected a string word, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val Base = 1000000000000L // 10^12: cost = Base − cnt
  private val Miss = 4000000000000000L // sentinel, mirrors uniFwdTermSk
  private val MaxPiece = 4

  @transient private lazy val costOf: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(Base - cnts(i)))
      i += 1
    }
    m
  }

  /** The whole forward + backtrack pass; public so generated code can
    * call it through the referenced expression object. */
  def encode(word: UTF8String): ArrayData = {
    val w = word.toString
    val len = w.length
    val fw = new Array[Long](len + 1)
    var i = 1
    while (i <= len) {
      var best = Miss
      var k = 1
      while (k <= MaxPiece && k <= i) {
        val c = costOf.get(w.substring(i - k, i))
        if (c != null) {
          val cand = fw(i - k) + c.longValue()
          if (cand < best) best = cand
        }
        k += 1
      }
      fw(i) = best
      i += 1
    }
    // Backtrack longest-piece-first; collect segments right-to-left.
    val segs = new java.util.ArrayList[UTF8String](len)
    var pos = len
    while (pos > 0) {
      var k = 1 // uniBtSk's ELSE branch — single chars are always in vocab
      var kk = MaxPiece
      while (kk >= 2 && k == 1) {
        if (pos >= kk) {
          val c = costOf.get(w.substring(pos - kk, pos))
          if (c != null && fw(pos - kk) + c.longValue() == fw(pos)) k = kk
        }
        kk -= 1
      }
      segs.add(UTF8String.fromString(w.substring(pos - k, pos)))
      pos -= k
    }
    val n = segs.size()
    val out = new Array[Any](n)
    var j = 0
    while (j < n) { out(j) = segs.get(n - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncode", this,
      classOf[UnigramEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {
  /** Column-level entry point: `word` → array of vocabulary pieces. */
  def apply(word: Column, pieces: Seq[String], cnts: Seq[Long]): Column =
    ColumnBridge.column(
      UnigramEncode(ColumnBridge.expression(word), pieces, cnts))
}
