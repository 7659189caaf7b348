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

  test("q182 SQL UDF: the body inlines — no UDF call survives in the optimized plan") {
    val df = SparkEntry.queries("q182_sql_udf")(spark, sf)
    assert(df.count() === 3) // return flags A/N/R
    // the function body was inlined at analysis: the optimized plan holds
    // plain decimal arithmetic, not an opaque function invocation
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("graft_disc_price"),
      s"SQL UDF survived as a black box:\n$plan")
    // and the UDF agrees with the inline expression row-for-row
    val inline = spark.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(df.collect().toSeq === inline.collect().toSeq)
  }

  test("q183 pipe syntax: the piped flow plans the same aggregate as nested SQL") {
    val piped = SparkEntry.queries("q183_pipe_syntax")(spark, sf)
    val nested = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 2 = 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    assert(piped.collect().toSeq === nested.collect().toSeq)
  }

  test("q184 offset pagination: pages tile the ordered stream without overlap") {
    def page(lim: Int, off: Int) = spark.sql(
      s"""SELECT o_orderkey FROM orders ORDER BY o_orderkey
         |LIMIT $lim OFFSET $off""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    val all = page(100, 0)
    assert(page(20, 40) === all.slice(40, 60))
    // consecutive pages are disjoint and contiguous
    assert((page(20, 0) ++ page(20, 20) ++ page(20, 40)) === all.take(60))
  }
}
