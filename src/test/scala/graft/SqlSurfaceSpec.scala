package graft

import org.apache.spark.sql.functions._

/** Mechanics of the Spark-4 SQL surface module (value parity is the
  * CORRECTNESS oracle): scripting leaves no session state behind, the
  * lateral decorrelates instead of nested-looping, and the recursive CTE
  * really iterates inside the plan. */
class SqlSurfaceSpec extends SparkSpec {

  test("q145 scripting: flag restored, session variable does not leak") {
    val before = spark.conf.getOption("spark.sql.scripting.enabled")
    val rows = SparkEntry.queries("q145_sql_script")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(spark.conf.getOption("spark.sql.scripting.enabled") === before,
      "scripting flag left flipped")
    // the script's DECLARE'd variable must not survive the block
    val e = intercept[Exception](spark.sql("SELECT avg_price").collect())
    assert(e.getMessage.contains("avg_price") ||
      e.getMessage.toLowerCase.contains("cannot be resolved"))
  }

  test("q146 lateral: decorrelated plan — no nested-loop per-nation re-scan") {
    val df = SparkEntry.queries("q146_lateral_topk")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"lateral fell back to a cartesian product:\n$plan")
    // top-2-per-group semantics equal the window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    val viaWindow = Tables.table(spark, sf, "customer")
      .join(Tables.table(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("n_name", "c_custkey", "c_acctbal")
      .orderBy("n_name", "c_custkey")
      .collect().toSeq
    assert(df.orderBy("n_name", "c_custkey").collect().toSeq === viaWindow)
  }

  test("q144 recursion: calendar is gap-free and spans exactly the order range") {
    val rows = SparkEntry.queries("q144_recursive_calendar")(spark, sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    // consecutive months, no gaps, anchored at the first order month
    rows.sliding(2).foreach { case Array((a, _), (b, _)) =>
      assert(a.plusMonths(1) === b, s"calendar gap between $a and $b")
    case _ => ()
    }
    val bounds = Tables.table(spark, sf, "orders")
      .agg(min(date_trunc("month", col("o_orderdate"))).cast("date"),
        max(date_trunc("month", col("o_orderdate"))).cast("date")).head()
    assert(rows.head._1 === bounds.getDate(0).toLocalDate)
    assert(rows.last._1 === bounds.getDate(1).toLocalDate)
    // total orders conserved across the gap-filled months
    assert(rows.map(_._2).sum === Tables.table(spark, sf, "orders").count())
  }
}
