package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-operator kNN: exact cosine top-k join as a first-class Catalyst
  * plan — the (c) rung of the extension ladder (custom `LogicalPlan` +
  * `Strategy` + `SparkPlan`), used where composing built-ins genuinely
  * can't express the efficient evaluation: the DataFrame formulation
  * (broadcast NLJ cross product → WindowExec row_number → filter) has to
  * MATERIALIZE all |Q|·|D| score rows and sort every partition's slice,
  * while this operator never materializes the cross product at all.
  *
  * Physical shape: the (small) query side is broadcast verbatim
  * ([[IdentityBroadcastMode]]); each partition of the (large) document side
  * streams once, maintaining one bounded size-k heap per query — O(|Q|·k)
  * state, |Q|·k output rows per partition instead of |Q|·|D_partition|.
  * Partition-local top-k is exact-lossless for global top-k (any row
  * dropped locally is dominated by k better rows that survive), so the
  * tiny candidate union is finished with an ordinary window rank upstream.
  * At 100 TB the document side scales by partitioning alone; the broadcast
  * bound is on the query batch, which a driver shards into rounds.
  *
  * Scores replicate graft.functions.DotProductDouble bit-for-bit
  * (index-order double accumulation, cos = dot / (na * nb)), so the
  * operator slots into q27's DuckDB-hash-checked contract unchanged.
  */
case class KnnTopKNode(
    k: Int,
    excludeSameGroup: Boolean,
    output: Seq[Attribute],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  // The node mints its output (nothing passes through from the children) —
  // declare it produced so CheckAnalysis doesn't demand child provenance.
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnTopKNode =
    copy(left = newLeft, right = newRight)
}

object KnnTopKNode {
  /** Children contract (both sides): (id BIGINT, vec ARRAY<FLOAT>, nrm
    * DOUBLE) in that column order — plus (grp BIGINT) as column 4 when
    * `excludeSameGroup` is set (contrastive hard-negative mining: a
    * candidate sharing the query's group is skipped in the streamed inner
    * loop, so the heap fills with the best CROSS-group neighbors without
    * ever materializing and post-filtering same-group pairs). Output attrs
    * are minted once here so plan-tree copies keep stable exprIds. */
  def apply(k: Int, excludeSameGroup: Boolean,
      left: LogicalPlan, right: LogicalPlan): KnnTopKNode =
    KnnTopKNode(k, excludeSameGroup, Seq(
      AttributeReference("vec_id", LongType, nullable = false)(),
      AttributeReference("nbr_id", LongType, nullable = false)(),
      AttributeReference("cos", DoubleType, nullable = false)()),
      left, right)
}

object KnnStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnTopKNode(k, ex, out, l, r) =>
      KnnTopKPartialExec(k, ex, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Partition-local exact top-k: broadcast queries × streamed docs →
  * ≤ |Q|·k candidate rows per partition. */
case class KnnTopKPartialExec(
    k: Int,
    excludeSameGroup: Boolean,
    output: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    BroadcastDistribution(IdentityBroadcastMode) :: UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val kk = k
    val exGrp = excludeSameGroup
    val bcast = left.executeBroadcast[Array[InternalRow]]()
    right.execute().mapPartitions { docIter =>
      val qRows = bcast.value
      val nQ = qRows.length
      val qId = new Array[Long](nQ)
      val qVec = new Array[Array[Float]](nQ)
      val qNrm = new Array[Double](nQ)
      val qGrp = if (exGrp) new Array[Long](nQ) else null
      var qi = 0
      while (qi < nQ) {
        val r = qRows(qi)
        qId(qi) = r.getLong(0)
        qVec(qi) = r.getArray(1).toFloatArray()
        qNrm(qi) = r.getDouble(2)
        if (exGrp) qGrp(qi) = r.getLong(3)
        qi += 1
      }
      // Per-query bounded heaps as parallel arrays sorted best-first by
      // (cos DESC, nbr_id ASC) — k is small, insertion shift is cheap.
      val heapCos = new Array[Double](nQ * kk)
      val heapId = new Array[Long](nQ * kk)
      val heapLen = new Array[Int](nQ)
      docIter.foreach { row =>
        val dId = row.getLong(0)
        val dVec = row.getArray(1).toFloatArray()
        val dNrm = row.getDouble(2)
        val dGrp = if (exGrp) row.getLong(3) else 0L
        val dim = dVec.length
        var q = 0
        while (q < nQ) {
          if (qId(q) != dId && (!exGrp || qGrp(q) != dGrp)) {
            val qv = qVec(q)
            var s = 0.0
            var i = 0
            while (i < dim) {
              s += qv(i).toDouble * dVec(i).toDouble
              i += 1
            }
            val cos = s / (qNrm(q) * dNrm)
            val base = q * kk
            val len = heapLen(q)
            // admit if heap not full or beats the current worst
            if (len < kk || cos > heapCos(base + len - 1) ||
                (cos == heapCos(base + len - 1) && dId < heapId(base + len - 1))) {
              var pos = if (len < kk) len else kk - 1
              while (pos > 0 && (heapCos(base + pos - 1) < cos ||
                  (heapCos(base + pos - 1) == cos && heapId(base + pos - 1) > dId))) {
                heapCos(base + pos) = heapCos(base + pos - 1)
                heapId(base + pos) = heapId(base + pos - 1)
                pos -= 1
              }
              heapCos(base + pos) = cos
              heapId(base + pos) = dId
              if (len < kk) heapLen(q) = len + 1
            }
          }
          q += 1
        }
      }
      val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
        LongType, LongType, DoubleType))
      val out = new GenericInternalRow(3)
      (0 until nQ).iterator.flatMap { q =>
        (0 until heapLen(q)).iterator.map { j =>
          out.update(0, qId(q))
          out.update(1, heapId(q * kk + j))
          out.update(2, heapCos(q * kk + j))
          numOutputRows += 1
          proj(out)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): KnnTopKPartialExec =
    copy(left = newLeft, right = newRight)
}

object KnnTopK {
  /** Exact cosine top-k of `queries` against `docs`; both DataFrames must
    * expose (id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE) in column
    * order. Returns ≤ |Q|·k·partitions candidates (vec_id, nbr_id, cos);
    * the caller finishes with an exact window rank over this tiny set. */
  def candidates(queries: DataFrame, docs: DataFrame, k: Int,
      excludeSameGroup: Boolean = false): DataFrame = {
    val spark = queries.sparkSession
    if (!spark.experimental.extraStrategies.contains(KnnStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ KnnStrategy
    }
    // Alias-freshen the doc side so a self-join (queries eq docs) presents
    // distinct output exprIds on the two children.
    val docsFresh = docs.select(docs.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    PlanBridge.ofRows(spark,
      KnnTopKNode(k, excludeSameGroup,
        queries.queryExecution.analyzed, docsFresh.queryExecution.analyzed))
  }
}
