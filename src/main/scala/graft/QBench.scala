package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for perf iteration:
  * `runMain graft.QBench <queryName> <sfDir> [iters]` — prints per-iteration
  * and best seconds. Same session shape as Bench. */
object QBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    var best = Double.MaxValue
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
      println(f"[qbench] $name iter $i: $sec%.3f s ($n rows)")
    }
    println(f"[qbench] $name best: $best%.3f s")
    spark.stop()
  }
}
