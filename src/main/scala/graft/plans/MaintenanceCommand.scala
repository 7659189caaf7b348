package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Maintenance-verb TVFs (`graft_optimize` / `graft_zorder` /
  * `graft_vacuum` / `graft_expire`) as LAZY plans: the TVF builder runs
  * at analysis time (the graft_asof literal-argument contract) but the
  * maintenance SIDE EFFECT runs only when the statement EXECUTES — an
  * `EXPLAIN SELECT * FROM graft_expire(...)`, an IDE schema probe, or a
  * failed multi-statement script that never reaches this statement
  * deletes nothing (r14 ADVICE: the destructive verbs used to fire at
  * analysis). The physical node runs the thunk driver-side exactly once
  * per planned statement (the ops are commit-log metadata work — there
  * is nothing to distribute) and emits the one report row. */
case class MaintenanceNode(output: Seq[Attribute], verb: String,
    run: () => Seq[Long]) extends LeafNode {
  override def producedAttributes: AttributeSet = AttributeSet(output)
}

object MaintenanceNode {
  /** One LongType report column per name, stable exprIds per node. */
  def apply(verb: String, cols: Seq[String], run: () => Seq[Long])
      : MaintenanceNode =
    MaintenanceNode(cols.map(c =>
      AttributeReference(c, LongType, nullable = false)()), verb, run)

  /** The live-session registration seam ([[graft.GraftFunctions
    * .register]]) has no extensions hook — mirror KnnTopK's lazy
    * strategy injection so TVF-built plans stay plannable there too. */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(MaintenanceStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ MaintenanceStrategy
    }
}

object MaintenanceStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case MaintenanceNode(out, verb, run) =>
      MaintenanceExec(out, verb, run) :: Nil
    case _ => Nil
  }
}

case class MaintenanceExec(output: Seq[Attribute], verb: String,
    run: () => Seq[Long]) extends LeafExecNode {

  override def nodeName: String = s"GraftMaintenance($verb)"

  // once per planned statement, even if the RDD re-materializes
  @transient private lazy val result: Seq[Long] = run()

  override protected def doExecute(): RDD[InternalRow] = {
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val row = proj(InternalRow.fromSeq(result)).copy()
    sparkContext.parallelize(Seq(row: InternalRow), 1)
  }
}
