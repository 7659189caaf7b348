package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: prints the formatted physical plan for the given
  * query names (or a representative set), for verifying pushdown, pruning,
  * broadcast choice, and whole-stage-codegen coverage (SURVEY §4). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_scan_project", "q03_join_broadcast", "q04_join_shuffle",
        "q09_agg_group", "q16_topk", "q33_pipeline_e2e")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_EXPLAIN_EXECUTED=1: drive each query and print the
    // EXECUTED plan's raw tree (what Bench's plan_fp normalizes+hashes) —
    // for diffing fingerprint stability across JVMs.
    val executed = sys.env.get("SPARK_GRAFT_EXPLAIN_EXECUTED").contains("1")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (executed) { df.count(); println(df.queryExecution.executedPlan.toString) }
      else df.explain("formatted")
    }
    spark.stop()
  }
}
