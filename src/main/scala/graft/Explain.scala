package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness: `runMain graft.Explain <sfDir> <query> [query…]`
  * prints each declared query's FORMATTED executed plan — the loop the
  * build uses to check that a new operator's plan is the one you'd want
  * at 100 TB (pruned scans, broadcast where intended, no stray
  * cartesian), not just the first one that passed. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [query…]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // force, so AQE's final plan is the one printed
      println(s"==== $name ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
